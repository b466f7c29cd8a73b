package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump the complete formatted physical plan of one query (PlanAudit
  * shows only the scan/join/exchange skeleton). */
object PlanFull {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || !graft.SparkEntry.queries.contains(args(0))) {
      System.err.println("usage: PlanFull <queryName> [sfDir]\nqueries:\n  " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
