package graft.events

import graft.SparkSpecBase
import Classifier._

/** Port of the reference's verdict-reason matrix
  * (dbt-classify/main_test.py:31-137 semantics). */
class ClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private val okRun = RunData("Triggered via webhook", Seq(RunStep(10), RunStep(20)), "2026-01-01")
  private def err(id: String, msg: String) = NodeResult("error", id, msg)

  test("metadata_unavailable: fail-closed when run data missing") {
    val v = decide(None, None)
    assert(v.reason == "metadata_unavailable" && !v.isRetryable)
  }

  test("already_retried: loop guard on Auto-retry cause, case-insensitive") {
    val run = okRun.copy(triggerCause = "AUTO-RETRY for transient failure in run 42")
    val v = decide(Some(run), Some(Seq(err("m.x", "backend error"))))
    assert(v.reason == "already_retried" && v.priorIsRetry && !v.isRetryable)
  }

  test("results_unavailable: artifact fetch failed -> no retry") {
    val v = decide(Some(okRun), None, resultsFetchFailed = true)
    assert(v.reason == "results_unavailable" && !v.isRetryable)
    assert(v.failedStepCount == 1)
  }

  test("no_results: empty results list -> no retry") {
    assert(decide(Some(okRun), Some(Nil)).reason == "no_results")
  }

  test("uncovered_step: step errored but no failed node -> no retry") {
    val v = decide(Some(okRun), Some(Seq(NodeResult("success", "m.ok", ""))))
    assert(v.reason == "uncovered_step" && !v.isRetryable)
  }

  test("transient: every failed node matches the allowlist -> retry once") {
    val v = decide(Some(okRun), Some(Seq(
      err("m.a", "Quota exceeded: too many requests"),
      err("m.b", "502 Backend Error occurred"))))
    assert(v.reason == "transient" && v.isRetryable)
    assert(v.failedCount == 2 && v.nontransientCount == 0)
  }

  test("nontransient: any non-allowlisted error blocks retry") {
    val v = decide(Some(okRun), Some(Seq(
      err("m.a", "deadline exceeded"),
      err("m.b", "relation \"foo\" does not exist"))))
    assert(v.reason == "nontransient" && !v.isRetryable)
    assert(v.nontransientNodes == Seq("m.b"))
  }

  test("fail status is never transient even with a transient-looking message") {
    val v = decide(Some(okRun), Some(Seq(
      NodeResult("fail", "t.assert", "connection reset"))))
    assert(v.reason == "nontransient" && !v.isRetryable)
  }

  test("distributed classifyRuns agrees with pure decide on node scans") {
    val nodes = Seq(
      ("r1", "error", "m.a", "quota exceeded"),
      ("r1", "error", "m.b", "backend error"),
      ("r2", "error", "m.a", "quota exceeded"),
      ("r2", "fail", "t.x", "connection reset"),
      ("r3", "success", "m.a", ""),
      ("r4", "error", "m.z", "syntax error at line 3"),
      // null message = unexplained error -> default-deny, like the
      // reference's `r.get("message") or ""` (classifier.py:75)
      ("r5", "error", "m.n", null)
    ).toDF("run_id", "status", "unique_id", "message")
    val out = Classifier.classifyRuns(nodes)
      .collect().map(r => r.getAs[String]("run_id") -> r.getAs[String]("reason")).toMap
    assert(out == Map("r1" -> "transient", "r2" -> "nontransient",
      "r3" -> "no_failures", "r4" -> "nontransient", "r5" -> "nontransient"))
  }
}
