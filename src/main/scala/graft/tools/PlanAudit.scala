package graft.tools
import org.apache.spark.sql.SparkSession
/** Audit physical plans of selected queries: pushed filters, read
  * schema pruning, join strategies, codegen coverage. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_filtered_scan", "q03_top_revenue_orders",
      "q05_region_revenue", "q10_latest_event_per_user", "q29_knn_bruteforce")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // summarize: scans with pushed filters/schema, joins, codegen stars
      plan.linesIterator.foreach { l =>
        val t = l.trim
        if (t.contains("FileScan") || t.contains("PushedFilters") ||
            t.contains("Join") || t.contains("Exchange") || t.contains("BatchScan"))
          println(l.take(240))
      }
    }
    spark.stop()
  }
}
