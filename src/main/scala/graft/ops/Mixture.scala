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

  /** Largest-remainder (Hamilton) apportionment of `budget` over the
    * per-group `weightCol`: base = (B·w) div W in DECIMAL(38,0) (so
    * arbitrary weight magnitudes never overflow), leftover seats to
    * the largest remainders (group tie-break) — Σ quota = B exactly.
    * The per-group frame is model-sized: unpartitioned windows by
    * design. Requires Σw > 0 (callers substitute a fallback weight
    * first). */
  private def apportion(perGroup: DataFrame, groupCol: String, budget: Long,
                        weightCol: String): DataFrame = {
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perGroup
      .withColumn("__W", sum(col(weightCol)).over(all))
      .withColumn("__base", expr(
        s"CAST((CAST($budget AS DECIMAL(38,0)) * $weightCol) DIV __W AS BIGINT)"))
      .withColumn("__rem",
        expr(s"CAST($budget AS DECIMAL(38,0)) * $weightCol % __W"))
      .withColumn("__left", lit(budget) - sum(col("__base")).over(all))
      .withColumn("__rank",
        row_number().over(Window.orderBy(col("__rem").desc, col(groupCol).asc)))
      .withColumn("quota",
        (col("__base") + when(col("__rank") <= col("__left"), 1L).otherwise(0L))
          .cast("long"))
      .drop("__W", "__base", "__rem", "__left", "__rank")
  }

  /** Per-group budget quotas: (group, n_docs, w_e6, quota) with
    * Σ quota = budget. `df` is the raw corpus; null groups drop. */
  def temperatureQuotas(df: DataFrame, groupCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("w_e6",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0)).cast("long"))
    apportion(counts, groupCol, budget, "w_e6")
      .select(col(groupCol), col("n_docs"), col("w_e6"), col("quota"))
  }

  /** Neyman-allocation stratified sampling quotas (Neyman 1934): the
    * variance-optimal split of a sampling budget, n_h ∝ N_h·S_h —
    * strata that are big AND internally varied get the samples; a
    * constant stratum needs (in the optimum) none. This is the
    * estimating counterpart of [[temperatureQuotas]]' balancing rule,
    * and the standard design for audit/eval sampling over a curated
    * corpus (estimate a corpus mean within a fixed labeling budget).
    *
    * Integer-exact: values must be pre-quantized longs (the
    * [[IncrementalAgg.momentStats]] rule); per-stratum population
    * variance is the same (n·Σv² − (Σv)²) DIV n² decimal quantum, and
    * S_h = floor(sqrt(var)) — sqrt is IEEE-correctly-rounded (the
    * [[temperatureQuotas]] argument), so every engine agrees on every
    * digit as long as var_q stays below 2^53 (values up to ~9·10^7
    * quanta; pick the quantization to fit). If every stratum is
    * constant (ΣN_h·S_h = 0) the rule degenerates and the allocation
    * falls back to proportional (weight = N_h), documented in the
    * output's `w` column. Rows with a null group or null value drop.
    *
    * One hash aggregate over the corpus; everything after runs on the
    * strata-sized frame. Output: (group, n_docs, var_q, s_q, w,
    * quota), Σ quota = budget. */
  def neymanQuotas(df: DataFrame, groupCol: String, valueCol: String,
                   budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val dec = "DECIMAL(38,0)"
    val v = col(valueCol).cast("long")
    val agg = df.filter(col(groupCol).isNotNull && v.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(v).as("__sv"),
        sum((v.cast(dec) * v).cast(dec)).as("__svv"))
      .withColumn("var_q", expr(
        s"""CAST((CAST(n_docs AS $dec) * __svv - CAST(__sv AS $dec) * CAST(__sv AS $dec))
           |DIV (CAST(n_docs AS $dec) * CAST(n_docs AS $dec)) AS BIGINT)""".stripMargin))
      .withColumn("s_q", floor(sqrt(col("var_q").cast("double"))).cast("long"))
      .withColumn("__w", col("n_docs") * col("s_q"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val weighted = agg
      .withColumn("__wtot", sum(col("__w")).over(all))
      .withColumn("w", when(col("__wtot") > 0L, col("__w")).otherwise(col("n_docs")))
      .drop("__sv", "__svv", "__w", "__wtot")
    apportion(weighted, groupCol, budget, "w")
      .select(col(groupCol), col("n_docs"), col("var_q"), col("s_q"),
        col("w"), col("quota"))
  }
}
