package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.FsUtils

/** K3 — ATOMIC multi-table publish via a versioned-manifest pointer,
  * closing the two-rename visibility window of [[TableSwap.stageAndSwap]]
  * (reference: okta-sync/main.py:587-625 `replace_dataset_bigquery`,
  * whose `CREATE OR REPLACE TABLE` is atomic per table in the warehouse;
  * one sync replaces users/groups/apps/group_members/app_users).
  *
  * Layout under a dataset `root`:
  * {{{
  *   _gens/<table>/gen-<seq>-<uuid8>/   versioned parquet data dirs
  *   _manifests/manifest-<seq %019d>    committed manifests (TSV)
  *   _manifests/.tmp-<uuid>             in-flight manifest writes
  * }}}
  *
  * A gen directory is INVISIBLE until a manifest references it, so data
  * writes need no staging/rename dance. A manifest lists EVERY table's
  * current gen dir (`name\tgenDirName` lines) and is committed by
  * writing a `.tmp-` file and renaming it to the next `manifest-<seq>`
  * — a single metadata op creating a FRESH name, atomic on HDFS-like
  * stores and POSIX. Readers resolve the highest committed seq, so:
  *
  *  - a multi-table publish flips ALL tables at once (one pointer);
  *  - a crash at ANY point (mid data write, mid tmp write, before the
  *    rename) leaves only unreferenced orphans — readers stay on the
  *    previous generation and no recovery step is ever required;
  *  - a crash AFTER the rename is a completed publish (sweep of old
  *    generations re-runs on the next publish).
  *
  * SINGLE WRITER per dataset root, as in the reference (one scheduled
  * sync at a time). The commit rename still refuses to clobber an
  * existing seq and retries against a re-read latest, so a violated
  * contract degrades to last-writer-wins at distinct seqs — never a
  * torn manifest. Old manifests are retained (default 2) so a reader
  * that resolved just before a publish keeps a live generation; size
  * retention to the longest read a concurrent consumer can run.
  */
object ManifestSwap {

  private val ManifestName = "^manifest-(\\d{19})$".r

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(s"$root/_manifests")
  private def genDir(root: String, name: String) = new Path(s"$root/_gens/$name")

  /** Committed manifests, ascending by seq. */
  private def committedManifests(fs: FileSystem, root: String): Seq[(Long, Path)] = {
    val dir = manifestDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ManifestName(seq) => Some((seq.toLong, st.getPath))
        case _                 => None
      }
    }.sortBy(_._1)
  }

  private def parseManifest(fs: FileSystem, path: Path): Map[String, String] =
    FsUtils.readUtf8(fs, path)
      .split("\n").iterator.filter(_.nonEmpty).map { line =>
        val Array(name, gen) = line.split("\t", 2)
        name -> gen
      }.toMap

  /** (latest committed seq, its table->genDirName mapping); (-1, empty)
    * before the first publish. */
  def currentMapping(spark: SparkSession, root: String): (Long, Map[String, String]) = {
    val fs = fsOf(spark, root)
    committedManifests(fs, root).lastOption match {
      case Some((seq, path)) => (seq, parseManifest(fs, path))
      case None              => (-1L, Map.empty)
    }
  }

  /** Mapping of a SPECIFIC committed seq, if still retained — the
    * generation-pinning read a reproducible consumer (e.g. a training
    * run that must see one frozen dataset across restarts) resolves
    * once and sticks with. Raise `retainManifests` on the publisher to
    * match how long pinned runs live. */
  def mappingAt(spark: SparkSession, root: String, seq: Long): Option[Map[String, String]] = {
    val fs = fsOf(spark, root)
    // the manifest name is fully determined by the seq — probe it
    // directly instead of listing the directory
    val p = new Path(manifestDir(root), "manifest-%019d".format(seq))
    if (fs.exists(p)) Some(parseManifest(fs, p)) else None
  }

  /** Resolved data path for `name`'s current generation, if published. */
  def resolvePath(spark: SparkSession, root: String, name: String): Option[String] =
    currentMapping(spark, root)._2.get(name)
      .map(gen => new Path(genDir(root, name), gen).toString)

  /** Read a table at its current generation. */
  def read(spark: SparkSession, root: String, name: String): DataFrame =
    resolvePath(spark, root, name) match {
      case Some(path) => spark.read.parquet(path)
      case None => throw new IllegalArgumentException(
        s"table '$name' has no published generation under $root")
    }

  /** Read a table as of a PINNED manifest seq (see [[mappingAt]]). */
  def readAt(spark: SparkSession, root: String, name: String, seq: Long): DataFrame =
    mappingAt(spark, root, seq).flatMap(_.get(name)) match {
      case Some(gen) => spark.read.parquet(new Path(genDir(root, name), gen).toString)
      case None => throw new IllegalArgumentException(
        s"table '$name' has no generation at seq $seq under $root " +
          "(never published, or swept past retention)")
    }

  /** Publish `tables` as ONE atomic generation flip: write each frame to
    * a fresh gen dir, then commit a single manifest carrying the new
    * dirs plus every unchanged table's current dir. Returns, per table,
    * whether its new data was published — `false` means the empty-input
    * guard refused to replace an existing table (the okta no-truncate
    * guard, okta-sync/main.py:947-951) and the OLD generation was
    * carried forward instead; an empty frame for a table that does not
    * exist yet publishes an empty table, matching
    * [[TableSwap.stageAndSwap]]. Row counts ride an [[Observation]] on
    * the write — no second pass. Old manifests/generations beyond
    * `retainManifests` are swept after the commit. */
  def publish(spark: SparkSession, root: String,
              tables: Map[String, DataFrame],
              retainManifests: Int = 2): Map[String, Boolean] = {
    require(retainManifests >= 1, s"retainManifests must be >= 1, got $retainManifests")
    tables.keys.foreach { n =>
      require(n.nonEmpty && !n.contains("/") && !n.contains("\t") && !n.contains("\n"),
        s"illegal table name '$n'")
    }
    val fs = fsOf(spark, root)
    val (seq, current) = currentMapping(spark, root)
    val newSeq = seq + 1

    // data writes first — invisible until the manifest references them
    val results = tables.map { case (name, df) =>
      val gen = "gen-%019d-%s".format(newSeq,
        java.util.UUID.randomUUID().toString.take(8))
      val path = new Path(genDir(root, name), gen)
      val obs = Observation(s"manifest_${name}_$newSeq")
      df.observe(obs, count(lit(1)).as("n"))
        .write.mode(SaveMode.Overwrite).parquet(path.toString)
      val rows = obs.get("n").asInstanceOf[Long]
      if (rows == 0L && current.contains(name)) {
        fs.delete(path, true) // refuse truncation; old gen stays current
        name -> None
      } else name -> Some(gen)
    }
    val mapping = current ++ results.collect { case (n, Some(g)) => n -> g }
    commit(fs, root, newSeq, mapping)
    sweep(fs, root, retainManifests)
    results.map { case (n, g) => n -> g.isDefined }
  }

  /** Write the manifest to a tmp file and rename it to the next free
    * seq. The rename-to-fresh-name is the atomic commit point; a taken
    * seq (single-writer contract violated) re-reads latest and retries
    * at a higher seq, so the worst case is two complete generations at
    * distinct seqs — never a torn pointer. */
  private[ops] def commit(fs: FileSystem, root: String, seq0: Long,
                          mapping: Map[String, String]): Unit = {
    val dir = manifestDir(root)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    FsUtils.writeUtf8(fs, tmp,
      mapping.toSeq.sorted.map { case (n, g) => s"$n\t$g" }.mkString("", "\n", "\n"))
    var seq = seq0
    var attempts = 0
    while (!fs.rename(tmp, new Path(dir, "manifest-%019d".format(seq)))) {
      attempts += 1
      require(attempts <= 5, s"manifest commit lost 5 seq races under $root " +
        "— concurrent writers violate the single-writer contract")
      seq = math.max(seq + 1, committedManifests(fs, root).lastOption.map(_._1 + 1).getOrElse(seq + 1))
    }
  }

  /** Drop manifests beyond the newest `retain` and every gen dir no
    * retained manifest references (covers crashed publishes' orphans
    * and abandoned `.tmp-` files). Runs after each publish; safe to
    * call any time from the single writer. */
  def sweep(fs: FileSystem, root: String, retain: Int): Unit = {
    val all = committedManifests(fs, root)
    if (all.isEmpty) return
    val (old, kept) = all.splitAt(math.max(0, all.size - retain))
    old.foreach { case (_, p) => fs.delete(p, false) }
    fs.listStatus(manifestDir(root)).toSeq
      .filter(_.getPath.getName.startsWith(".tmp-"))
      .foreach(st => fs.delete(st.getPath, false))
    val live: Map[String, Set[String]] = kept
      .flatMap { case (_, p) => parseManifest(fs, p).toSeq }
      .groupBy(_._1).map { case (n, gs) => n -> gs.map(_._2).toSet }
    val gensRoot = new Path(s"$root/_gens")
    if (fs.exists(gensRoot)) fs.listStatus(gensRoot).toSeq.foreach { tdir =>
      val keep = live.getOrElse(tdir.getPath.getName, Set.empty)
      fs.listStatus(tdir.getPath).toSeq
        .filterNot(st => keep.contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
    }
  }
}
