package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-balanced mixture quotas — the multilingual/multi-source
  * sampling rule (mT5/XLM-R style: sample source s with probability
  * ∝ n_s^τ, τ < 1 upweights small sources) turned into an exact
  * integer apportionment of a document budget.
  *
  * Determinism: τ = 1/2, so the temperature weight is sqrt — the ONE
  * transcendental-free power: IEEE-754 requires sqrt (and the
  * subsequent multiply) correctly rounded, so `floor(sqrt(n)·10⁶)` is
  * bit-identical in every conforming engine (unlike pow/exp/ln, the
  * q101/q112 lesson). Quotas then use the largest-remainder method
  * (Hamilton apportionment), all integer: base = (B·w) div W,
  * leftover seats go to the largest remainders (source tie-break) —
  * Σ quota = B exactly, by construction.
  *
  * Scale shape: one hash aggregate over the corpus (count per source);
  * everything after runs on the per-source frame — group cardinality
  * is model-sized (thousands at most), so its unpartitioned windows
  * are driver-trivial at any corpus size.
  */
object Mixture {

  /** Per-group budget quotas: (group, n_docs, w_e6, quota) with
    * Σ quota = budget. `df` is the raw corpus; null groups drop. */
  def temperatureQuotas(df: DataFrame, groupCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("w_e6",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0)).cast("long"))
    // the per-group frame is tiny: unpartitioned windows by design
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withBase = counts
      .withColumn("__W", sum(col("w_e6")).over(all))
      .withColumn("__base", expr(s"($budget * w_e6) div __W"))
      .withColumn("__rem", expr(s"($budget * w_e6) % __W"))
      .withColumn("__left", lit(budget) - sum(col("__base")).over(all))
      .withColumn("__rank",
        row_number().over(Window.orderBy(col("__rem").desc, col(groupCol).asc)))
    withBase
      .withColumn("quota",
        (col("__base") + when(col("__rank") <= col("__left"), 1L).otherwise(0L))
          .cast("long"))
      .select(col(groupCol), col("n_docs"), col("w_e6"), col("quota"))
  }
}
