package graft.bench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graftbridge.ListenerDrain
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic per-query execution metrics (r14 verdict directive #1).
  *
  * Wall-clock on this box has a documented ±40–70% run-context band on the
  * big-shuffle families (q78, q26/q113, q164) — three rounds of bench deltas
  * there could not be adjudicated from seconds alone. Shuffle ROW counts,
  * by contrast, are a pure function of (plan, data): identical on every run
  * of an unchanged query, moved only by a code or plan change. Recording
  * them next to the seconds turns "is this +70% drift or a regression?"
  * into a table lookup: rows moved → code-shaped; rows identical → ambient.
  *
  * Byte counts (shuffle read/write, spill) are *nearly* deterministic —
  * compression ratios vary slightly with partition packing — so they are
  * recorded as corroboration, while row counts are the pinned signal.
  * `peakTaskMemBytes` (max over tasks of Spark's per-task execution-memory
  * peak) is scheduling-dependent but bounds "would this fit an executor".
  */
final case class QueryMetrics(
    shuffleReadRows: Long,
    shuffleReadBytes: Long,
    shuffleWriteRows: Long,
    shuffleWriteBytes: Long,
    spillMemBytes: Long,
    spillDiskBytes: Long,
    inputBytesRead: Long,
    inputRecordsRead: Long,
    peakTaskMemBytes: Long,
    tasks: Long,
    drained: Boolean) {

  /** The run-independent signal: total rows crossing a shuffle boundary. */
  def shuffleRows: Long = shuffleReadRows + shuffleWriteRows

  def json: String =
    s"""{"shuffle_read_rows": $shuffleReadRows, "shuffle_read_bytes": $shuffleReadBytes, """ +
      s""""shuffle_write_rows": $shuffleWriteRows, "shuffle_write_bytes": $shuffleWriteBytes, """ +
      s""""spill_mem_bytes": $spillMemBytes, "spill_disk_bytes": $spillDiskBytes, """ +
      s""""input_bytes_read": $inputBytesRead, "input_records_read": $inputRecordsRead, """ +
      s""""peak_task_mem_bytes": $peakTaskMemBytes, "tasks": $tasks, "drained": $drained}"""
}

/** Accumulating task-end listener. Usage (strictly sequential — one query
  * at a time, as Bench/Drill run them):
  *
  *   val mx = QueryMetricsListener.install(spark)
  *   mx.reset(); runQuery(); val m = mx.read(spark)
  *
  * `read` first drains the listener bus (via [[ListenerDrain]]) so the
  * final task-end events of the just-finished job are counted; on the
  * rare bus timeout the snapshot is flagged `drained: false` rather than
  * silently short.
  *
  * `jobGroup`: None counts every task in the session — right for Bench,
  * a dedicated sequential process where everything between reset() and
  * read() IS the query (including any foreachBatch jobs a stream gate
  * runs on background threads, which carry their own group id). Some(g)
  * counts only stages of jobs tagged `sc.setJobGroup(g, …)` — required
  * in a SHARED session (the test JVM), where an earlier suite's stray
  * background work would otherwise pollute the figures. */
final class QueryMetricsListener(jobGroup: Option[String] = None) extends SparkListener {
  private val srRows, srBytes, swRows, swBytes = new AtomicLong(0)
  private val spillMem, spillDisk, inBytes, inRows, nTasks = new AtomicLong(0)
  private val peakMem = new AtomicLong(0)
  private val tracked = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  override def onJobStart(e: SparkListenerJobStart): Unit =
    if (jobGroup.isDefined && e.properties != null &&
        jobGroup.contains(e.properties.getProperty("spark.jobGroup.id")))
      e.stageIds.foreach(id => tracked.add(id))

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    // successful attempts only: a failed or speculation-killed task's
    // partial shuffle counters are run-context (what the determinism
    // signal must exclude), not plan work
    if (m != null && e.taskInfo != null && e.taskInfo.successful &&
        (jobGroup.isEmpty || tracked.contains(e.stageId))) {
      srRows.addAndGet(m.shuffleReadMetrics.recordsRead)
      srBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      swRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      swBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
      // source-scan volume (r15 directive #3): bytes/records the scan
      // actually read — the signal that pins file-level pruning claims
      // (probed-bucket reads must scale with buckets, not corpus)
      inBytes.addAndGet(m.inputMetrics.bytesRead)
      inRows.addAndGet(m.inputMetrics.recordsRead)
      peakMem.accumulateAndGet(m.peakExecutionMemory, (a: Long, b: Long) => math.max(a, b))
      nTasks.incrementAndGet()
    }
  }

  def reset(): Unit = {
    Seq(srRows, srBytes, swRows, swBytes, spillMem, spillDisk, inBytes, inRows,
      nTasks, peakMem).foreach(_.set(0))
    tracked.clear()
  }

  /** Drain the bus, then snapshot. `drainTimeoutMs` default is generous:
    * the bus clears in milliseconds when healthy, and a stuck bus should
    * surface as a flag, not a hang. */
  def read(spark: SparkSession, drainTimeoutMs: Long = 10000L): QueryMetrics = {
    val ok = ListenerDrain.waitUntilEmpty(spark.sparkContext, drainTimeoutMs)
    QueryMetrics(
      srRows.get, srBytes.get, swRows.get, swBytes.get,
      spillMem.get, spillDisk.get, inBytes.get, inRows.get,
      peakMem.get, nTasks.get, drained = ok)
  }
}

object QueryMetricsListener {
  def install(spark: SparkSession, jobGroup: Option[String] = None): QueryMetricsListener = {
    val l = new QueryMetricsListener(jobGroup)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
