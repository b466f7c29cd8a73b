package graft.ops

import org.apache.spark.sql.SparkSession

/** Edge-count-derived shuffle sizing for the iterative graph family
  * (PageRank / label propagation / connected components) — the r13
  * sf10 finding encoded as a rule instead of a manual knob: q93's
  * per-round join through 32 partitions put ~2.8M edge rows
  * (~400 MB) on each partition, past the spill threshold, and ran
  * 1.8× over linear; at 64 partitions (~1.4M rows each) the same
  * chain ran 1.27× linear with identical shuffle volume. The operators
  * materialize their edge relation first anyway (every round joins
  * it), so its count is a free scan — partitions then scale with the
  * data.
  *
  * The session value is a FLOOR, never shrunk: small graphs keep the
  * caller's parallelism (and AQE coalesces undersized shuffles on its
  * own); the rule only engages when the edge relation outgrows the
  * session setting. On a real cluster, executor count and AQE absorb
  * this axis — in local mode the conf IS the knob, which is why the
  * operators own it rather than documenting a tuning footnote. */
private[graft] object ShuffleSizing {

  /** ~1.5M edge-sized rows per shuffle partition ≈ 200 MB through the
    * per-round join+agg — inside the measured no-spill envelope. */
  val RowsPerPartition = 1500000L

  /** Runaway guard (a 6B-edge relation still gets a sane number). */
  val MaxPartitions = 4096

  def targetPartitions(edgeRows: Long): Int =
    math.min(MaxPartitions.toLong,
      math.max(1L, (edgeRows + RowsPerPartition - 1) / RowsPerPartition)).toInt

  /** Run `body` with `spark.sql.shuffle.partitions` raised to the
    * edge-scaled target (restored after); a no-op when the session
    * value already covers it. `body` must EXECUTE its jobs inside the
    * call (the graph loops do — each round materializes eagerly). */
  def withEdgeScaledShuffle[T](spark: SparkSession, edgeRows: Long)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val current = spark.conf.get(key).toInt
    val target = targetPartitions(edgeRows)
    if (target <= current) body
    else {
      // one quiet operational note per engagement — this knob moving is
      // exactly what a scale drill needs to see in its log
      System.err.println(s"[shuffle-sizing] $edgeRows edge rows -> " +
        s"$key $current -> $target (restored after)")
      spark.conf.set(key, target.toString)
      try body finally spark.conf.set(key, current.toString)
    }
  }
}
