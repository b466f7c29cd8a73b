package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump a catalog query's `.explain("formatted")` (the pre-execution
  * plan with PushedFilters/ReadSchema) plus the post-execution final
  * AQE plan to a file — the round's plan-evidence artifact
  * (plans/rNN/<query>_{before,after}.txt).
  *
  *   ./run_local.sh graft.tools.PlanSnap <query> <sfDir> <outFile>
  *
  * Runs at the bench shape (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus) so the captured plan is the one the bench
  * executes, not a downsized replica. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <query> <sfDir> <outFile>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    df.collect() // materialize so AQE finalizes the plan
    val finalPlan = df.queryExecution.executedPlan.toString
    val w = new java.io.PrintWriter(args(2), "UTF-8")
    try {
      w.println(s"== ${args(0)} @ ${args(1)} (local[$cpus]) ==")
      w.println()
      w.println("---- explain(formatted), pre-execution ----")
      w.println(formatted)
      w.println("---- final plan after execution (AQE-final) ----")
      w.println(finalPlan)
    } finally w.close()
    println(s"[plansnap] ${args(0)} -> ${args(2)}")
    spark.stop()
  }
}
