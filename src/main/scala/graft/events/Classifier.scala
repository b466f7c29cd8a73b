package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rules-based failure classifier for the auto-retry pipeline — a
  * Spark-idiomatic re-expression of the reference's pure decision
  * logic (reference: dbt-classify/classifier.py:1-136). The verdict
  * logic is pure Scala (unit-testable, driver-side, exactly like the
  * reference keeps it out of I/O); the node scan is also exposed as a
  * Column predicate so the same allowlist can classify millions of
  * rows distributed (SURVEY.md §2 P9).
  *
  * Verdict reasons (classifier.py:11-19):
  *   already_retried, metadata_unavailable, results_unavailable,
  *   no_results, uncovered_step, nontransient, transient.
  */
object Classifier {

  /** Transient / infrastructure error allowlist, case-insensitive.
    * Default-deny: no match => not retryable
    * (reference: dbt-classify/classifier.py:26-37). */
  val TransientPattern: String =
    "(?i)(already exists: job|ratelimitexceeded|exceeded rate limits|jobratelimitexceeded" +
      "|quota exceeded|quotaexceeded|resources exceeded|resourcesexceeded" +
      "|service unavailable|backend error|backenderror|internal error" +
      "|deadline exceeded|deadlineexceeded|could not serialize access" +
      "|connection reset|connection aborted|connection broken|try again later)"

  private val transientRegex = TransientPattern.r

  /** dbt Cloud run-step status 20 == Error (classifier.py:40). */
  val StepStatusError = 20

  final case class RunStep(status: Int)
  final case class RunData(triggerCause: String, runSteps: Seq[RunStep], createdAt: String = "")
  final case class NodeResult(status: String, uniqueId: String, message: String)

  final case class Verdict(
      reason: String,
      isRetryable: Boolean = false,
      priorIsRetry: Boolean = false,
      failedCount: Int = 0,
      nontransientCount: Int = 0,
      failedNodes: Seq[String] = Nil,
      nontransientNodes: Seq[String] = Nil,
      failedStepCount: Int = 0,
      runCreatedAt: String = "")

  /** Loop guard: the retry trigger sets a cause containing "Auto-retry"
    * (classifier.py:43-51); the guard lives in the data, not the infra. */
  def isAlreadyRetried(run: RunData): Boolean =
    "(?i)auto-retry".r.findFirstIn(Option(run.triggerCause).getOrElse("")).isDefined

  def countFailedSteps(run: RunData): Int =
    run.runSteps.count(_.status == StepStatusError)

  final case class Scan(failedNodes: Seq[String], nontransientNodes: Seq[String]) {
    def failedCount: Int = failedNodes.size
    def nontransientCount: Int = nontransientNodes.size
  }

  /** Tally failed vs non-transient nodes (classifier.py:59-79):
    * "fail" = assertion/data problem, never transient;
    * "error" retryable only when the message matches the allowlist. */
  def classifyResults(results: Seq[NodeResult]): Scan = {
    val failed = Seq.newBuilder[String]
    val nontransient = Seq.newBuilder[String]
    results.foreach { r =>
      r.status match {
        case "fail" =>
          failed += r.uniqueId; nontransient += r.uniqueId
        case "error" =>
          failed += r.uniqueId
          if (transientRegex.findFirstIn(Option(r.message).getOrElse("")).isEmpty)
            nontransient += r.uniqueId
        case _ =>
      }
    }
    Scan(failed.result(), nontransient.result())
  }

  /** Produce the retry verdict (classifier.py:98-136). Fail-closed:
    * unreadable metadata or unexplained step errors never retry. */
  def decide(runData: Option[RunData], results: Option[Seq[NodeResult]],
             resultsFetchFailed: Boolean = false): Verdict = {
    runData match {
      case None => Verdict("metadata_unavailable")
      case Some(run) =>
        if (isAlreadyRetried(run))
          return Verdict("already_retried", priorIsRetry = true, runCreatedAt = run.createdAt)
        val failedSteps = countFailedSteps(run)
        if (resultsFetchFailed)
          return Verdict("results_unavailable", failedStepCount = failedSteps,
            runCreatedAt = run.createdAt)
        val rs = results.getOrElse(Nil)
        if (rs.isEmpty)
          return Verdict("no_results", failedStepCount = failedSteps, runCreatedAt = run.createdAt)
        val scan = classifyResults(rs)
        if (failedSteps > 0 && scan.failedCount == 0)
          return Verdict("uncovered_step", failedStepCount = failedSteps,
            failedCount = 0, nontransientCount = 0, runCreatedAt = run.createdAt)
        val retryable = scan.failedCount > 0 && scan.nontransientCount == 0
        Verdict(if (retryable) "transient" else "nontransient",
          isRetryable = retryable,
          failedCount = scan.failedCount, nontransientCount = scan.nontransientCount,
          failedNodes = scan.failedNodes, nontransientNodes = scan.nontransientNodes,
          failedStepCount = failedSteps, runCreatedAt = run.createdAt)
    }
  }

  // --- distributed form -----------------------------------------------------

  /** Column predicate: is this node-result message a transient error?
    * Codegen'd rlike — classifies arbitrarily many rows with no UDF. */
  def isTransientCol(message: Column): Column = message.rlike(TransientPattern)

  /** Per-run verdict over a DataFrame of node results
    * (run_id, status, unique_id, message): one hash aggregate, then the
    * same default-deny rule. Scales to any number of runs/nodes. */
  def classifyRuns(nodeResults: DataFrame): DataFrame = {
    nodeResults
      .groupBy(col("run_id"))
      .agg(
        sum(when(col("status").isin("fail", "error"), 1).otherwise(0)).as("failed_count"),
        // null message -> "" like the reference (classifier.py:75
        // `r.get("message") or ""`): no allowlist match -> NONTRANSIENT.
        // Without the coalesce, rlike(null) is null and the three-valued
        // `when` would silently count a null-message error as transient —
        // breaking the default-deny rule exactly where it matters.
        sum(when(col("status") === "fail" ||
          (col("status") === "error" && !isTransientCol(coalesce(col("message"), lit("")))), 1)
          .otherwise(0)).as("nontransient_count"))
      .withColumn("is_retryable",
        col("failed_count") > 0 && col("nontransient_count") === 0)
      .withColumn("reason",
        when(col("failed_count") === 0, "no_failures")
          .when(col("is_retryable"), "transient")
          .otherwise("nontransient"))
  }
}
