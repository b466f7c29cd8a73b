package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** K2/K3 — staging write + swap publish
  * (reference: okta-sync/main.py:587-625 `replace_dataset_bigquery`,
  * :908-931 truncate-then-append).
  *
  * The reference loads each batch into `temp_okta` then issues
  * `CREATE OR REPLACE TABLE target AS SELECT * FROM temp` per table.
  * On plain parquet the swap here is a directory rename with a
  * crash-window between the two renames. [[ManifestSwap]] is the ATOMIC
  * publish path (versioned gen dirs + manifest pointer, multi-table) —
  * prefer it for dataset-style syncs; this rename protocol remains for
  * fixed-path tables whose consumers address `<root>/<name>` directly.
  */
object TableSwap {

  /** Write df to `<root>/_staging/<name>`, then publish to
    * `<root>/<name>` by a two-step same-FS rename through
    * `<root>/_trash/<name>-<stamp>`. Refuses to publish an empty result
    * over an existing table (empty-truncation guard,
    * okta-sync/main.py:947-951).
    *
    * Why two renames instead of delete-then-rename: a recursive delete
    * is O(files) and not undoable — a crash mid-delete leaves a
    * half-table, and after it completes the old data is gone before the
    * new data is live. Renames are single metadata ops on HDFS-like
    * stores: the only crash window is between the two renames, it never
    * exposes partial data (the table is absent, not half-written), the
    * old table is still intact in _trash, and [[recoverSwap]] restores
    * it at startup. A failed publish rename rolls the old table back
    * immediately. The old copy is deleted only after the new one is
    * live. (True atomicity needs a transactional format — Delta/
    * Iceberg `CREATE OR REPLACE` — documented deviation, SURVEY §7.)
    *
    * SINGLE WRITER per table, as in the reference (one scheduled sync
    * at a time): two concurrent swaps of one table can interleave
    * rename/heal steps in ways no rename protocol on a plain FS can
    * order. The publish still refuses to rename onto an existing
    * target (which would NEST the directory on HDFS semantics), so a
    * violated contract degrades to a failed publish + rollback, not a
    * corrupted table. */
  def stageAndSwap(spark: SparkSession, df: DataFrame, root: String, name: String): Boolean = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val staging = new org.apache.hadoop.fs.Path(s"$root/_staging/$name")
    val target = new org.apache.hadoop.fs.Path(s"$root/$name")
    val fs = target.getFileSystem(hconf)
    // self-heal first: if a previous swap died between renames, restore
    // the old table before the empty-guard / hadOld logic looks at it —
    // every call site gets crash recovery without wiring recoverSwap
    recoverSwap(spark, root, name)
    if (df.isEmpty && fs.exists(target)) return false
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // millis stamp (lexically sortable -> newest-copy recovery) plus a
    // random uniquifier: two swaps in the same tick must NOT share a
    // trash path — rename into an existing dir would NEST the old table
    val trash = new org.apache.hadoop.fs.Path(
      s"$root/_trash/$name-${"%019d".format(System.currentTimeMillis())}-" +
        java.util.UUID.randomUUID().toString.take(8))
    val hadOld = fs.exists(target)
    if (hadOld) {
      fs.mkdirs(trash.getParent)
      if (!fs.rename(target, trash)) return false
    }
    fs.mkdirs(target.getParent)
    // never rename onto an existing target: a concurrent healer/writer
    // that re-created it would make this rename NEST staging inside the
    // live dir; refusing degrades a contract violation to rollback
    val published = !fs.exists(target) && fs.rename(staging, target)
    if (published) { if (hadOld) fs.delete(trash, true) }
    else if (hadOld) fs.rename(trash, target) // roll the old table back
    published
  }

  /** Crash-between-renames recovery for [[stageAndSwap]] (also run
    * automatically at the start of every swap): if a swap moved the old
    * table to `_trash` but died before publishing, the table is missing
    * — restore the NEWEST trashed copy. Callable once at startup before
    * reads. No-op (false) when the table exists; any trash left behind
    * then is from a swap that died after publishing, and is swept.
    * Staged data is never auto-published: its write may itself be the
    * thing that died, so the retried job rewrites it.
    *
    * Trash entries are matched by the EXACT `<name>-<19 digits>-<hex>`
    * pattern (the hex uniquifier optional, accepting entries written
    * before it existed) — a prefix match would let table "users" sweep
    * or restore sibling table "users-archive"'s copies. */
  def recoverSwap(spark: SparkSession, root: String, name: String): Boolean = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(s"$root/$name")
    val trashDir = new org.apache.hadoop.fs.Path(s"$root/_trash")
    val fs = target.getFileSystem(hconf)
    val stamp = (s"^${java.util.regex.Pattern.quote(name)}-\\d{19}(-[0-9a-f]{8})?$$").r
    val copies =
      if (!fs.exists(trashDir)) Seq.empty
      else fs.listStatus(trashDir).toSeq
        .filter(st => stamp.matches(st.getPath.getName)).sortBy(_.getPath.getName)
    if (fs.exists(target)) {
      copies.foreach(st => fs.delete(st.getPath, true)) // post-publish leftovers
      false
    } else copies.lastOption.exists { newest =>
      copies.init.foreach(st => fs.delete(st.getPath, true))
      fs.rename(newest.getPath, target)
    }
  }

  /** Truncate-then-append micro-batch sink: first batch overwrites,
    * later batches append (reference: okta-sync/main.py:908-931). */
  def writeBatch(df: DataFrame, path: String, firstBatch: Boolean): Unit =
    df.write.mode(if (firstBatch) SaveMode.Overwrite else SaveMode.Append).parquet(path)
}
