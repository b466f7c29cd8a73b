package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-portable sketches: approximate aggregates whose every bit —
  * including the approximation error — is reproducible on any engine
  * with md5 and integer arithmetic, so they can be oracle-gated the way
  * Spark's built-in sketches (`approx_count_distinct`'s HLL++,
  * `stat.bloomFilter`; spec'd in ApproxAggSpec) never can be: those
  * hash with engine-private functions, so two engines legitimately
  * disagree. Portability costs nothing at scale — the shapes below are
  * the same partial-aggregate map-side-combine plans as the built-ins.
  */
object Sketches {

  /** Flajolet-style HLL register index + rank from one md5 evaluation:
    * bucket from hex digits 1-15, rank (position of the first 1-bit,
    * 1-based) from the disjoint digits 16-30 — 60 independent bits,
    * far past any realistic register rank. Both pieces are pure
    * substring/CASE arithmetic on the hex string, so DuckDB reproduces
    * them verbatim (see the q92 oracle). */
  private def hexLeadingZeros(w: Column): Column =
    length(regexp_extract(w, "^0*", 0))

  /** Portable HyperLogLog distinct count per group.
    *
    * `p` register-index bits (m = 2^p registers; rsd ≈ 1.04/√m). The
    * estimate is the RAW HLL harmonic mean — deliberately no
    * small-range linear-counting correction, because that needs `ln`,
    * whose last-ulp behaviour is libm-specific and would break
    * bit-parity; callers should size p so expected cardinality exceeds
    * 2.5·m, where the raw estimator is the recommended one anyway.
    * All arithmetic to the final floor division is exact integer work
    * in DECIMAL(38,0): registers hold max-rank integers, the harmonic
    * sum is Σ 2^(61-rank) (empty registers contribute 2^61), and
    * alpha_m = 0.7213/(1 + 1.079/m) enters as the exact rational
    * 7213·1000m / (10⁴·(1000m+1079)) — numerator ≤ ~3e32 < 10^38 for
    * p ≤ 8, so nothing overflows and nothing rounds.
    *
    * Output: groupCols, n_exact (exact distinct, from the same pass:
    * the register index is a function of the value, so per-register
    * exact distincts sum to the group's), n_hll (the estimate),
    * used_buckets. One narrow projection, two hash aggregations — the
    * classic partial-agg shape; at 100 TB the register table
    * (groups × m rows) is the only shuffled state.
    *
    * Scaladoc note vs reference: the reference engine delegates
    * distinct counts to its warehouse's exact scan (SURVEY.md §2.4 —
    * no sketches); this is the scale path it lacks. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 8, s"p must be in [4,8] (m=16..256, overflow-proven), got $p")
    val m = 1 << p
    val dec = DecimalType(38, 0)
    val hx = md5(value.cast("string"))
    val bucket = (conv(substring(hx, 1, 15), 16, 10).cast("long") % m).as("__bucket")
    val w = substring(hx, 16, 15)
    val z = hexLeadingZeros(w)
    val firstNz = conv(w.substr(z + 1, lit(1)), 16, 10).cast("int")
    val extra = when(firstNz >= 8, 0).when(firstNz >= 4, 1)
      .when(firstNz >= 2, 2).otherwise(3)
    val rank = when(z === 15, lit(61)).otherwise(z * 4 + extra + 1)
    val grp = groupCols.map(col)
    // alpha_m * m^2, scaled by 2^61 and the exact-rational alpha denominators
    val num = BigDecimal(BigInt(7213) * 1000 * m * m * m * BigInt(2).pow(61))
    val denScale = 10000L * (1000L * m + 1079L)
    val emptyTerm = lit(BigDecimal(BigInt(2).pow(61)).bigDecimal).cast(dec)
    df.select(grp :+ bucket :+ rank.as("__rank") :+ value.cast("string").as("__v"): _*)
      .groupBy(grp :+ col("__bucket"): _*)
      .agg(max(col("__rank")).as("__mr"), countDistinct(col("__v")).as("__du"))
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("used_buckets"), sum(col("__du")).as("n_exact"),
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - __mr) AS DECIMAL(38,0))")).as("__s"))
      .withColumn("__stot",
        col("__s") + (lit(m) - col("used_buckets")).cast(dec) * emptyTerm)
      .withColumn("__num", lit(num.bigDecimal).cast(dec))
      .withColumn("__den", lit(denScale).cast(dec) * col("__stot"))
      .withColumn("n_hll", expr("__num DIV __den"))
      .select(grp ++ Seq(col("n_exact"), col("n_hll"), col("used_buckets")): _*)
  }
}
