package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.events.Router

/** Structured Streaming form of the reference's event plane
  * (SURVEY.md §2.9): push-not-poll webhook events flow through a
  * topic (file dir / Kafka), get parsed + routed distributed, deduped
  * under at-least-once delivery, and drive a delayed single-retry
  * state machine.
  */
object EventStream {

  /** T1 — read the raw webhook topic as a stream of (body, ts) and
    * route it. File-dir source locally; the same plan runs on Kafka by
    * swapping `format`. */
  def routedStream(spark: SparkSession, topicDir: String): DataFrame = {
    val raw = spark.readStream
      .schema("body STRING, event_ts TIMESTAMP")
      .json(topicDir)
    Router.route(Router.parse(raw))
  }

  /** T2 — at-least-once delivery + dedup: duplicate deliveries of the
    * same run are expected; keep the first within the watermark
    * (docs/ARCHITECTURE.md:93-96). State is bounded by the watermark —
    * safe at any event rate. */
  def dedupDeliveries(routed: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    routed
      .withWatermark("event_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("run_id")

  /** T8 — windowed event-time aggregation (the streaming form of the
    * hourly batch rollup): counts per route per tumbling window. */
  def windowedRouteCounts(routed: DataFrame, window_ : String = "5 minutes",
                          watermarkDelay: String = "10 minutes"): DataFrame =
    routed
      .withWatermark("event_ts", watermarkDelay)
      .groupBy(window(col("event_ts"), window_), col("route"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact-dedup at ingestion — the streaming twin of the
    * batch fingerprint dedup (q25): documents whose whitespace/case-
    * normalised content already arrived within the watermark are
    * dropped before they ever land. State is one fingerprint per unique
    * doc inside the watermark window, so memory is bounded at any
    * ingest rate — the shape for dedup-on-arrival in a training-data
    * feed. */
  def dedupDocumentsStream(docs: DataFrame, textCol: String, tsCol: String,
                           watermarkDelay: String = "10 minutes"): DataFrame = {
    // collision-proof internal column: never clobber (then drop) a
    // user column that happens to share the working name
    val fp = Iterator.from(0).map(i => s"__graft_fp$i")
      .find(n => !docs.columns.contains(n)).get
    docs
      .withColumn(fp, graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(fp)
      .drop(fp)
  }

  /** Stream-stream event correlation (attribution): inner-join two
    * live streams on a key with an event-time INTERVAL condition —
    * response events within (0, `withinSeconds`] after their trigger.
    * Both sides carry watermarks, so Spark bounds the join state to the
    * interval plus the allowed lateness and drops buffered rows once
    * the watermark passes — the attribution join (impression→click,
    * send→failure) over unbounded streams with bounded memory; an
    * unwatermarked stream-stream join would buffer forever. */
  def correlateStreams(trigger: DataFrame, response: DataFrame,
                       keyCol: String, triggerTs: String, responseTs: String,
                       withinSeconds: Long,
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    require(withinSeconds > 0, s"window must be positive, got $withinSeconds")
    val l = trigger.withWatermark(triggerTs, watermarkDelay).alias("t")
    val r = response.withWatermark(responseTs, watermarkDelay).alias("r")
    l.join(r,
        col(s"t.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$responseTs") > col(s"t.$triggerTs") &&
          col(s"r.$responseTs") <=
            col(s"t.$triggerTs") + expr(s"INTERVAL $withinSeconds SECONDS"))
      // one key column out — the duplicate response-side key would make
      // the bare name ambiguous for every downstream select/groupBy
      .drop(col(s"r.$keyCol"))
  }

  /** Event-time sessionization as a streaming operator — the native
    * `session_window` form of the batch lag+cumsum query (q34): events
    * for a key that arrive within `gap` of each other merge into one
    * session row; watermark bounds state. At scale this is the shape
    * for clickstream sessionization over billions of events — state
    * per open session only, merged incrementally, never a full-history
    * window sort. */
  def sessionized(events: DataFrame, keyCol: String, tsCol: String,
                  gap: String = "30 minutes",
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  // --- T3: delayed retry with supersede + loop guard ------------------------

  final case class FailureEvent(job_id: String, run_id: String, event_ts: java.sql.Timestamp)
  final case class RetryState(runId: String, firedAt: Long)
  final case class RetryAction(job_id: String, run_id: String, action: String)

  /** Keyed state machine: on a failure event for a job, arm a timer
    * (the reference waits 300 s, docs/ARCHITECTURE.md:93); newer runs
    * for the same job supersede the armed one; when the timer fires,
    * emit a single classify-and-maybe-retry action. The loop guard
    * (already-retried cause) lives in the classifier, as in the
    * reference — the stream only guarantees at-most-one armed retry
    * per job. */
  def retryArbiter(delayMs: Long)(
      jobId: String,
      events: Iterator[FailureEvent],
      state: GroupState[RetryState]): Iterator[RetryAction] = {
    if (state.hasTimedOut) {
      val armed = state.getOption
      state.remove()
      armed.map(s => RetryAction(jobId, s.runId, "classify_and_retry")).iterator
    } else {
      // latest run supersedes any armed retry for this job
      val latest = events.toSeq.maxByOption(_.event_ts.getTime)
      latest.foreach { e =>
        state.update(RetryState(e.run_id, System.currentTimeMillis()))
        state.setTimeoutDuration(delayMs)
      }
      Iterator.empty
    }
  }

  /** Wire the arbiter onto a stream of parsed failure events. */
  def delayedRetries(spark: SparkSession, failures: DataFrame, delayMs: Long): DataFrame = {
    import spark.implicits._
    failures.as[FailureEvent]
      .groupByKey(_.job_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        retryArbiter(delayMs))
      .toDF()
  }
}
