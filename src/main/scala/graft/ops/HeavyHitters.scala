package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at sketch cost: all values occurring more than
  * n/threshold times, with their EXACT counts.
  *
  * The naive plan shuffles every distinct value's partial count; over
  * a 100 TB token stream the distinct-value table is itself corpus-
  * sized (hapax legomena dominate real vocabularies), so the exchange
  * is the bottleneck. This is the two-phase frequent-items scheme
  * built on Misra–Gries summaries (Misra & Gries 1982; the "frequent"
  * algorithm of Demaine et al. / Karp et al. 2003):
  *
  *   Phase 1 — per-partition MG summaries with threshold−1 counters
  *   surface every value whose PARTITION-LOCAL count exceeds
  *   n_p/threshold. Pigeonhole guarantees completeness of the union:
  *   a value with global count > n/threshold = Σ n_p/threshold must
  *   exceed n_p/threshold in at least one partition (if it lost every
  *   local race, its global count ≤ Σ n_p/threshold). So the union of
  *   local candidates ⊇ all global heavy hitters, and its size is
  *   bounded by partitions·(threshold−1) — row-count independent.
  *
  *   Phase 2 — exact counts of the candidates only: a broadcast
  *   semi-join keeps candidate rows (everything else never enters the
  *   exchange), one hash aggregate counts them, and the global
  *   `count·threshold > n` filter discards the false positives local
  *   skew let through.
  *
  * The candidate SET depends on partitioning; the OUTPUT does not
  * (spec-pinned): phase 2 counts are exact and the final predicate is
  * a pure function of (value, global count, n). Engine-portable by
  * construction — the result equals a plain GROUP BY/HAVING, which is
  * exactly what the oracle runs. NULL values are ignored (they are
  * not countable identities). Output: (value, cnt). */
object HeavyHitters {

  /** Misra–Gries over one iterator: every value with local count
    * > total/threshold is guaranteed a surviving counter. */
  private[ops] def misraGries(it: Iterator[String], threshold: Int): Iterator[String] = {
    val counters = new scala.collection.mutable.HashMap[String, Long]
    it.foreach { v =>
      if (v != null) {
        val c = counters.getOrElse(v, 0L)
        if (c > 0L || counters.size < threshold - 1) counters.update(v, c + 1L)
        else {
          // decrement-all; amortized O(1): each decrement cancels an
          // earlier increment, so total work is O(stream length)
          val dead = List.newBuilder[String]
          counters.mapValuesInPlace((_, n) => n - 1L)
          counters.foreach { case (k, n) => if (n == 0L) dead += k }
          dead.result().foreach(counters.remove)
        }
      }
    }
    counters.keysIterator
  }

  /** All values of `value` (as strings) with global count
    * > n/threshold, exact. `threshold` ≥ 2; memory is
    * (threshold−1) counters per task. */
  def heavyHitters(df: DataFrame, value: Column, threshold: Int): DataFrame = {
    require(threshold >= 2, s"threshold must be >= 2, got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.cast("string").as("value")).filter(col("value").isNotNull)
    val candidates = vals.as[String]
      .mapPartitions(it => misraGries(it, threshold))
      .toDF("value").distinct()
    val total = vals.agg(count(lit(1)).as("__n"))
    vals
      .join(broadcast(candidates), Seq("value"), "left_semi")
      .groupBy(col("value"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(threshold.toLong) > col("__n"))
      .select(col("value"), col("cnt"))
  }
}
