package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group z-score anomaly flagging from exact sufficient statistics.
  *
  * The group stats (n, Σx, Σx²) are accumulated in DECIMAL — exact and
  * associative, so partition order can't perturb them (the builtin
  * stddev's float accumulation is partition-order-nondeterministic) —
  * then surfaced as doubles once. mean/variance/z are then a fixed
  * dag of IEEE ops (÷, ×, −, sqrt are all correctly rounded), so any
  * engine computing the same formulation from the same sums produces
  * bit-identical z values; only transcendental functions would break
  * that, and none are used.
  *
  * Shape: one hash-agg per group + a broadcast join of the tiny
  * per-group stats back onto the rows — the row side never shuffles,
  * so this is a single-pass scan at any scale. Operands are cast to
  * DECIMAL(9,2) before squaring so the product stays inside every
  * engine's unwidened decimal range (values must carry ≤2 decimals
  * and fit in 7 integer digits — true for money-like measures; widen
  * the cast for other domains).
  */
object Outliers {

  /** Rows whose |z| exceeds `threshold` within their group, with the
    * diagnostics (group mean/stddev and the z itself) attached. */
  def zscoreOutliers(rows: DataFrame, groupCol: String, valueCol: String,
                     threshold: Double): DataFrame = {
    val d = col(valueCol).cast(DecimalType(9, 2))
    val stats = rows.groupBy(col(groupCol)).agg(
      count(col(valueCol)).as("__n"),
      sum(d).cast("double").as("__s1"),
      sum(d * d).cast("double").as("__s2"))
    val mean = col("__s1") / col("__n").cast("double")
    val sd = sqrt(col("__s2") / col("__n").cast("double") - (col("__s1") / col("__n").cast("double")) * (col("__s1") / col("__n").cast("double")))
    val withZ = rows
      .join(broadcast(stats), groupCol)
      .withColumn("grp_mean", mean)
      .withColumn("grp_sd", sd)
      // Zero-variance groups have no meaningful z (and ANSI mode makes
      // the division an error, not an Infinity): null z, never flagged.
      .withColumn("z", when(col("grp_sd") > lit(0.0),
        (col(valueCol) - col("grp_mean")) / col("grp_sd")))
    withZ
      .filter(abs(col("z")) > threshold)
      .drop("__n", "__s1", "__s2")
  }

  /** Robust outlier screen per group: median and MAD (median absolute
    * deviation — Hampel 1974, the robust σ) computed EXACTLY as rank
    * cuts, then rows flagged where |v − median| > madFactor·MAD. Both
    * medians are the ⌈n/2⌉-th order statistic (the lower median — a
    * pure value-domain definition no averaging can smear across
    * engines). Unlike [[zscoreOutliers]], a few wild rows cannot drag
    * the fences (breakdown point 50% vs 0%), and the decision is pure
    * integer comparison — no IEEE dag to keep in lockstep.
    *
    * Scale shape: ONE corpus aggregate builds the per-group value
    * histogram; medians, deviation histogram, MAD, and the flag counts
    * all run on that bounded table ([[Sketches.quantilesFromBins]]'s
    * rank-cut machinery — windows partition over bins, never rows).
    * `value` must be integral (milli-quantize first, the house rule).
    * A group where over half the mass sits AT the median has MAD = 0
    * and flags every off-median row — the strict-fence degenerate
    * case, deterministic on both engines. Output: (group…, n, med,
    * mad, n_outliers). */
  def robustOutliers(df: DataFrame, groupCols: Seq[String], value: Column,
                     madFactor: Int = 3): DataFrame = {
    require(madFactor >= 1, s"madFactor must be >= 1, got $madFactor")
    val grp = groupCols.map(col)
    val hist = df.filter(value.isNotNull)
      .groupBy(grp :+ value.cast("long").as("bin"): _*)
      .agg(count(lit(1)).as("n"))
    val med = Sketches.quantilesFromBins(hist, groupCols, Seq(500L))
      .select(grp :+ col("bin").as("med") :+ col("n_values").as("__nt"): _*)
    val devHist = hist.join(med, groupCols)
      .groupBy(grp :+ abs(col("bin") - col("med")).as("bin"): _*)
      .agg(sum(col("n")).as("n"))
    val mad = Sketches.quantilesFromBins(devHist, groupCols, Seq(500L))
      .select(grp :+ col("bin").as("mad"): _*)
    hist.join(med, groupCols).join(mad, groupCols)
      .groupBy(grp: _*)
      .agg(max(col("__nt")).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(abs(col("bin") - col("med")) > col("mad") * lit(madFactor.toLong),
          col("n")).otherwise(lit(0L))).as("n_outliers"))
  }
}
