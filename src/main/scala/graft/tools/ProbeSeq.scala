package graft.tools
import org.apache.spark.sql.SparkSession
/** Time a sequence of SparkEntry queries in one JVM (bench-order repro). */
object ProbeSeq {
  def main(args: Array[String]): Unit = {
    val threads = sys.env.getOrElse("PROBE_THREADS", "32")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.head
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"[probeseq] $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
