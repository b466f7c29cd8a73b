package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (z-order) clustering for
  * write-side file organization.
  *
  * At 100 TB a table is read through file-level min/max statistics
  * (parquet row-group stats, manifest pruning). A linear sort clusters
  * ONE dimension — every other predicate column degrades to full scan.
  * Interleaving the bits of two (or more) columns into a single z-value
  * and range-partitioning files on it keeps per-file min/max ranges
  * tight on BOTH dimensions at once, so either predicate prunes.
  *
  * The z-value is a pure per-row bit-interleave — map-only, exact
  * integer, codegen'd (`shiftleft`/`shiftrightunsigned`/`|` compose
  * inside whole-stage codegen). File assignment at production scale is
  * `repartitionByRange(zval)` and nothing else (sampled boundaries are
  * fine for layout). [[zorderFileStats]] instead assigns files by EXACT
  * global rank ([[Sampling.globalRank]] — distributed prefix-sum, no
  * single-reducer sort) so the per-file statistics are bit-deterministic
  * for the correctness gate.
  */
object Layout {

  /** 2-D Morton interleave: bit b of x lands at position 2b, bit b of y
    * at 2b+1. `bits` ≤ 31 keeps the result in a non-negative long.
    * Inputs must be non-negative and < 2^bits (caller contract; values
    * wider than `bits` silently fold into the top bits' neighborhood,
    * which degrades clustering but stays deterministic). */
  def zValue(x: Column, y: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(xs, b).bitwiseAND(1), 2 * b)
        .bitwiseOR(shiftleft(shiftrightunsigned(ys, b).bitwiseAND(1), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Assign each row to one of `numFiles` equal-count files in z-order
    * and return per-file layout statistics (count + min/max of both
    * dimensions) — the pruning envelope a manifest would record.
    * Deterministic: file = floor(rank0 · numFiles / n) over the exact
    * global rank by (zval, id). */
  def zorderFileStats(df: DataFrame, idCol: String, xCol: String, yCol: String,
                      numFiles: Int, bits: Int = 31): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val z = df
      .filter(col(idCol).isNotNull && col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("zval", zValue(col(xCol), col(yCol), bits))
    // the total row count rides out of the rank's own tiny offsets
    // frame — re-aggregating the ranked output would repeat the whole
    // rank pass (window + broadcast join) a second time
    Sampling.globalRank(z, Seq(col("zval").asc, col(idCol).asc),
        out = "__rank", withTotal = true)
      .withColumn("file_id",
        expr(s"CAST(((__rank - 1) * $numFiles) DIV __total AS INT)"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
  }
}
