package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val threads = sys.env.getOrElse("PROBE_THREADS", "8")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    // warm the JVM/codegen path with a trivial action first
    spark.range(10).count()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[probe] run$i $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
