package graft.tools
import org.apache.spark.sql.SparkSession
/** Print the full physical plan of a catalog query (post-AQE-prep). */
object ExplainPhys {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark,
      if (args.length > 1) args(1) else "/root/testdata/sf0.01")
    df.collect() // materialize so AQE finalizes the plan
    println(df.queryExecution.executedPlan.toString)
  }
}
