package graft.events

import graft.SparkSpecBase

/** Routing matrix per dbt-webhook/main_test.py semantics: success ->
  * completed, failure -> retry, cancelled/other -> ignore, malformed
  * -> ignore. */
class RouterSpec extends SparkSpecBase {
  import spark.implicits._

  private def body(event: String, code: Int, status: String) =
    s"""{"eventType":"$event","accountId":"a1",
        "data":{"jobId":"84393","jobName":"nightly","runId":"r-$code",
                "runStatus":"$status","runStatusCode":$code,
                "runStatusMessage":"$status","environmentId":"e1"}}"""
      .replaceAll("\n\\s*", "")

  test("routing matrix") {
    val raw = Seq(
      body("job.run.completed", 10, "Success"),
      body("job.run.completed", 20, "Error"),
      body("job.run.completed", 30, "Cancelled"),
      body("job.run.started", 1, "Running"),
      """{"unparseable": true}""",
      "not json at all",
      // contradictory payload: Error string wins over Success code,
      // because the reference checks the Error branch first
      // (dbt-webhook/main.py:305-312)
      body("job.run.completed", 10, "Error")
    ).toDF("body")
    val routed = Router.route(Router.parse(raw))
      .select("route").as[String].collect().toSeq
    assert(routed == Seq("completed", "retry", "ignore", "ignore", "ignore", "ignore", "retry"))
  }

  test("parse extracts typed fields; ids arrive as strings") {
    val p = Router.parse(Seq(body("job.run.completed", 10, "Success")).toDF("body")).head()
    assert(p.getAs[String]("job_id") == "84393")
    assert(p.getAs[String]("run_id") == "r-10")
    assert(p.getAs[Int]("run_status_code") == 10)
    assert(p.getAs[String]("account_id") == "a1")
  }

  test("static mapping join: mapped job gets config, unmapped gets null (no publish)") {
    val df = Seq("163545", "999").toDF("job_id")
    val out = Router.withStaticMapping(df, "job_id",
      Map("163545" -> "fabric-workspace-1"), "fabric_config")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("163545").contains("fabric-workspace-1"))
    assert(out("999").isEmpty)
  }
}
