package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** K2/K3 — staging write + swap publish
  * (reference: okta-sync/main.py:587-625 `replace_dataset_bigquery`,
  * :908-931 truncate-then-append).
  *
  * The reference loads each batch into `temp_okta` then issues
  * `CREATE OR REPLACE TABLE target AS SELECT * FROM temp` per table.
  * On plain parquet the swap is a directory rename (not transactional —
  * a transactional format like Delta/Iceberg would make `CREATE OR
  * REPLACE` atomic; documented deviation, SURVEY.md §7 risks).
  */
object TableSwap {

  /** Write df to `<root>/_staging/<name>`, then publish to
    * `<root>/<name>` by rename. Refuses to publish an empty result over
    * an existing table (empty-truncation guard,
    * okta-sync/main.py:947-951).
    */
  def stageAndSwap(spark: SparkSession, df: DataFrame, root: String, name: String): Boolean = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val staging = new org.apache.hadoop.fs.Path(s"$root/_staging/$name")
    val target = new org.apache.hadoop.fs.Path(s"$root/$name")
    val fs = target.getFileSystem(hconf)
    if (df.isEmpty && fs.exists(target)) return false
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (fs.exists(target)) fs.delete(target, true)
    fs.mkdirs(target.getParent)
    fs.rename(staging, target)
  }

  /** Truncate-then-append micro-batch sink: first batch overwrites,
    * later batches append (reference: okta-sync/main.py:908-931). */
  def writeBatch(df: DataFrame, path: String, firstBatch: Boolean): Unit =
    df.write.mode(if (firstBatch) SaveMode.Overwrite else SaveMode.Append).parquet(path)
}
