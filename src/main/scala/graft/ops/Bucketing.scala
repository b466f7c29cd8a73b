package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support for co-located joins: write both sides of a
  * recurring join bucketed (and sorted) on the join key, and the join
  * runs shuffle-free — the scan's output partitioning already satisfies
  * the join's distribution requirement. At 100 TB this converts the
  * dominant repeated shuffle (e.g. orders⋈lineitem every run) into a
  * one-time layout cost at write time.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys. Caller reads
    * via spark.table so the catalog's bucket spec reaches the planner. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
