package graft.tools
import org.apache.spark.sql.SparkSession

/** Execute a query and report whether AQE reused duplicate exchange
  * stages at runtime (the static plan prints both subtrees — e.g.
  * budgetSelect's two consumers of one range exchange — but stage-level
  * reuse only shows in the post-execution adaptive plan). */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q73_token_budget_select")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"$n: reused-stages=" +
        "ReusedQueryStage|ReusedExchange".r.findAllIn(plan).size +
        " exchanges=" + "Exchange (hash|range)partitioning".r.findAllIn(plan).size)
    }
    spark.stop()
  }
}
