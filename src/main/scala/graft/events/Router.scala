package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Webhook payload parsing + event routing, re-expressed as Spark
  * column logic so a stream of raw webhook bodies routes distributed
  * (reference: dbt-webhook/webhook_utils.py:63-99 parse,
  * dbt-webhook/main.py:298-319 route; SURVEY.md §2 P7/P8).
  */
object Router {

  /** Schema of a dbt-style job.run.completed webhook body. */
  val WebhookSchema: StructType = StructType(Seq(
    StructField("eventType", StringType),
    StructField("accountId", StringType),
    StructField("data", StructType(Seq(
      StructField("jobId", StringType),
      StructField("jobName", StringType),
      StructField("runId", StringType),
      StructField("runStatus", StringType),
      StructField("runStatusCode", IntegerType),
      StructField("runStatusMessage", StringType),
      StructField("environmentId", StringType))))))

  /** Parse raw JSON bodies into typed columns; malformed bodies yield a
    * null struct (the "return {}" path of the reference parser). */
  def parse(raw: DataFrame, bodyCol: String = "body"): DataFrame =
    raw.withColumn("w", from_json(col(bodyCol), WebhookSchema))
      .select(
        col("*"),
        col("w.eventType").as("event_type"),
        col("w.accountId").as("account_id"),
        col("w.data.jobId").as("job_id"),
        col("w.data.runId").as("run_id"),
        col("w.data.runStatus").as("run_status"),
        col("w.data.runStatusCode").as("run_status_code"),
        col("w.data.environmentId").as("environment_id"))
      .drop("w")

  /** Routing rule (dbt-webhook/main.py:298-319): only job.run.completed
    * events route; 20/Error -> retry topic, 10/Success -> completed
    * topic, anything else ignored. The Error branch is checked FIRST,
    * matching the reference's clause order (main.py:305-312): a
    * contradictory payload (runStatusCode=10 with runStatus='Error')
    * goes to the failure handler. */
  def routeExpr(eventType: Column, statusCode: Column, status: Column): Column =
    when(eventType =!= "job.run.completed" || eventType.isNull, "ignore")
      .when(statusCode === 20 || status === "Error", "retry")
      .when(statusCode === 10 || status === "Success", "completed")
      .otherwise("ignore")

  def route(parsed: DataFrame): DataFrame =
    parsed.withColumn("route",
      routeExpr(col("event_type"), col("run_status_code"), col("run_status")))

  /** Static lookup-map join (webhook_utils.py:107-133 Fabric mapping;
    * SURVEY.md §2 J4/P8): broadcast a literal map as a DataFrame and
    * left-join; rows with no mapping keep null config (= "no publish"). */
  def withStaticMapping(df: DataFrame, keyCol: String,
                        mapping: Map[String, String], outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mapDf = broadcast(mapping.toSeq.toDF(keyCol, outCol))
    df.join(mapDf, Seq(keyCol), "left")
  }
}
