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
}
