package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual salting for skewed equi-joins — the classic mitigation when
  * one join key carries a disproportionate share of the left side's
  * rows and the right side is too big to broadcast (where AQE's
  * skew-join split can't help: e.g. the skew is known up front, or the
  * join feeds an aggregation that must not see AQE's partition
  * coalescing).
  *
  * Left rows get a salt in [0, salts) derived by hashing the row's
  * whole key tuple plus a per-row discriminator (`salt_on` columns,
  * e.g. a unique id) — deterministic, no rand(): re-evaluation of the
  * plan subtree (AQE retry, stage re-attempt, Spark's lazy
  * re-computation) reproduces the same salt, where a rand() salt
  * silently double- or zero-counts rows on retry. The right side is
  * exploded ×salts, so every (key, salt) bucket finds its match. The
  * join result is row-identical to the unsalted join — salting only
  * changes the partition histogram.
  *
  * Cost model: right side is replicated `salts`× through the shuffle —
  * pick salts ≈ (skewed-key share × left rows) / target-partition-rows,
  * small (8–64); the win is the hot key's rows spreading over `salts`
  * reducers instead of one straggler.
  */
object SkewJoin {

  /** Inner equi-join on `keys`, left side salted on `saltOn`. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltOn: Seq[String], salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltExpr = pmod(
      crc32(concat_ws("", (keys ++ saltOn).map(c => col(c).cast("string")): _*)),
      lit(salts.toLong)).cast("int")
    val l = left.withColumn("__salt", saltExpr)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
