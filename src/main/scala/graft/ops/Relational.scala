package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational operator core, re-expressed as composable
  * DataFrame transforms. Each maps to a SURVEY.md §2 row; all of them
  * compile to stock Catalyst plans (hash aggregate / window / anti
  * join) that scale by partitioning — no driver-side iteration.
  */
object Relational {

  /** A4 — keyed dedup keep-latest: `row_number() over (partition by keys
    * order by <orderCols desc>)` keep rn=1
    * (reference: okta-sync/main.py:628-671, DEDUP_CONFIG :24-30).
    *
    * Scale note: one hash shuffle on the key columns; skewed keys are
    * handled by AQE. The rank column is dropped so downstream plans can
    * prune it.
    */
  def keepLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A1 — max-watermark read: latest `sync_timestamp`-style value,
    * optionally per partition column (reference: woo-sync/main.py:26-42).
    * A full scan collapses to a partial+final max — no wide shuffle.
    */
  def maxWatermark(df: DataFrame, tsCol: String, keyCols: Seq[String] = Nil): DataFrame =
    if (keyCols.isEmpty) df.agg(max(col(tsCol)).as("watermark"))
    else df.groupBy(keyCols.map(col): _*).agg(max(col(tsCol)).as("watermark"))

  /** A2 — group-count threshold (HAVING): ids of groups whose member
    * count exceeds a cap ("everyone" exclusion, threshold 800 000;
    * reference: okta-sync/main.py:674-717). Map-side partial count
    * then a final filter — the canonical scalable HAVING.
    */
  def countOverThreshold(df: DataFrame, keyCol: String, threshold: Long): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n")).filter(col("n") > threshold)

  /** J1 — set difference as a left-anti join
    * (reference: okta-sync/main.py:1002-1005 `set(all) - set(everyone)`).
    */
  def exceptIds(all: DataFrame, excluded: DataFrame, idCol: String): DataFrame =
    all.join(excluded, Seq(idCol), "left_anti")

  /** J2 — union-dedup of id lists
    * (reference: okta-sync/main.py:992-1001). `unionByName` tolerates
    * ragged inputs the way `pd.concat` does.
    */
  def unionDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true).distinct()

  /** Empty-input truncation guard: never overwrite a target from an
    * empty batch (reference: okta-sync/main.py:947-951 `wrote_any`).
    * Kept driver-side because it gates a destructive write.
    */
  def nonEmpty(df: DataFrame): Boolean = !df.isEmpty

  /** Salted equi-join for skewed keys: explode the small/duplicable
    * side `saltFactor` ways and scatter the big side's hot keys across
    * the salts, so one hot key occupies `saltFactor` reducers instead
    * of one. AQE's skew-join handles most cases at runtime; explicit
    * salting remains the tool when a single key exceeds what one task
    * can hold (the 800 K-member "everyone" groups of the reference are
    * exactly this shape). Correctness: every (bigRow, smallRow) match
    * appears exactly once because the big row's salt picks exactly one
    * replica of the small row.
    *
    * The salt must vary WITHIN a hot key even when the big side holds
    * fully identical rows (the classic case: log rows projected to the
    * join key), yet stay DETERMINISTIC under stage retry: an
    * order-seeded salt (monotonically_increasing_id) can re-draw
    * different salts when a lost-executor retry recomputes a shuffled
    * upstream whose fetch order changed, duplicating matches consumed
    * by already-finished reducers and dropping others (the
    * round-robin-repartition hazard class). So the salt hashes row
    * content PLUS the input partition id — independent of row order,
    * stable under same-partition recomputation, and identical replicas
    * spread because a hot key large enough to matter spans many input
    * partitions (split size bounds what one partition holds; replicas
    * inside ONE partition sharing a salt just keeps that partition's
    * rows together, the granularity a task already processes).
    * Columns containing a map ANYWHERE in their type are excluded from
    * the hash (xxhash64 rejects nested maps too); they only cost
    * spreading when every other column ties. Names are backtick-quoted
    * so dotted column names don't resolve as struct paths. */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case org.apache.spark.sql.types.ArrayType(e, _) => containsMap(e)
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  private[ops] def bigSideSalt(big: DataFrame, saltFactor: Int): Column = {
    val hashable = big.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(s"`${f.name}`")).toSeq
    pmod(xxhash64((hashable :+ spark_partition_id().cast("long")): _*),
      lit(saltFactor)).cast("int")
  }

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", bigSideSalt(big, saltFactor))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
