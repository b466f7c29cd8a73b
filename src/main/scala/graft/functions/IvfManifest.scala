package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.core.FsUtils

/** Versioned FILE manifests + a write-ahead intent log for the on-disk
  * IVF index family ([[VectorFunctions.writeIvfIndex]] layouts) — the
  * [[graft.ops.ManifestSwap]] generation discipline applied one level
  * down, to the index's data files, so the index stays exact under
  * live readers and under crashes mid-compaction.
  *
  * Layout under an index `root` (beside `bucket=*` / `batch=*`):
  * {{{
  *   _ivf_manifests/manifest-<seq %019d>   committed file lists (one
  *                                         relative data-file path per
  *                                         line; THE live set at seq)
  *   _ivf_manifests/gc-<seq %019d>         files dropped BY manifest
  *                                         <seq>, awaiting physical
  *                                         delete (deferred past the
  *                                         manifest retention window so
  *                                         a reader pinned to an older
  *                                         manifest keeps live files)
  *   _ivf_manifests/pending-intent         write-ahead intent log of an
  *                                         in-flight compaction
  *   _ivf_manifests/.tmp-*                 in-flight control writes
  * }}}
  *
  * Why a file manifest and not directory listing: compaction lands new
  * files BEFORE old ones can be removed, so a listing reader can
  * transiently double-count (the r16 scaladoc boundary), and a crash
  * between the landing and the deletes would make the double-count
  * permanent for listers. With manifests, the single atomic commit
  * (tmp write + rename to a fresh `manifest-<seq>`) IS the visibility
  * flip: a reader resolves one manifest and sees exactly one
  * generation of the index, bit-for-bit, no matter what a concurrent
  * or crashed compaction is doing to the tree around it.
  *
  * The intent log closes the crash window on the WRITER side: every
  * structural pass (compaction) first records the full plan — renames,
  * the next manifest's content, deferred deletes — then executes it.
  * Each step is idempotent (rename only if source still exists, skip
  * the manifest write if its seq already committed, control writes
  * overwrite), so recovery is simply "re-execute the pending log",
  * run by the next compaction's entry. A crash at ANY point either
  * replays to completion or, if the log itself never landed, leaves
  * only unreferenced orphans readers never resolve.
  *
  * SINGLE WRITER per index root (the ManifestSwap contract): one
  * maintainer stream / one compaction job at a time. Readers are
  * unrestricted. */
private[graft] object IvfManifest {

  private val ManifestName = "^manifest-(\\d{19})$".r
  private val GcName = "^gc-(\\d{19})$".r

  /** One committed manifest: the index's live relative file paths. */
  final case class State(seq: Long, files: Seq[String])

  /** One step of a pending structural pass. */
  sealed trait Op
  /** Rename (file or whole dir); skipped on replay if already done. */
  final case class Mv(src: String, dst: String) extends Op
  /** Delete now (legacy tree with no possible pinned reader). */
  final case class Rm(path: String) extends Op

  private def controlDir(root: Path) = new Path(root, "_ivf_manifests")
  private def intentPath(root: Path) = new Path(controlDir(root), "pending-intent")

  private def control(fs: FileSystem, root: Path, rx: scala.util.matching.Regex): Seq[(Long, Path)] = {
    val dir = controlDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case rx(seq) => Some((seq.toLong, st.getPath))
        case _       => None
      }
    }.sortBy(_._1)
  }

  /** Atomic small-file commit: tmp write + rename to a fresh name. */
  private def commitFile(fs: FileSystem, root: Path, name: String, text: String): Unit = {
    val tmp = new Path(controlDir(root), s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    FsUtils.writeUtf8(fs, tmp, text)
    require(fs.rename(tmp, new Path(controlDir(root), name)),
      s"manifest commit rename failed: $tmp -> $name")
  }

  def latest(fs: FileSystem, root: Path): Option[State] =
    control(fs, root, ManifestName).lastOption.map { case (seq, p) =>
      State(seq, FsUtils.readUtf8(fs, p).split("\n").iterator.filter(_.nonEmpty).toSeq)
    }

  /** Commit `files` as manifest seq = latest+1; prune manifests beyond
    * `retain` (the pinned-reader window, ManifestSwap semantics). */
  def commit(fs: FileSystem, root: Path, files: Seq[String], retain: Int): Long = {
    val seq = latest(fs, root).map(_.seq + 1).getOrElse(0L)
    commitAt(fs, root, seq, files)
    prune(fs, root, retain)
    seq
  }

  /** Commit at a KNOWN seq — idempotent (replay skips if committed). */
  def commitAt(fs: FileSystem, root: Path, seq: Long, files: Seq[String]): Unit = {
    val p = new Path(controlDir(root), "manifest-%019d".format(seq))
    if (!fs.exists(p))
      commitFile(fs, root, "manifest-%019d".format(seq), files.sorted.mkString("\n"))
  }

  private def prune(fs: FileSystem, root: Path, retain: Int): Unit = {
    val all = control(fs, root, ManifestName)
    all.dropRight(retain).foreach { case (_, p) => fs.delete(p, false) }
  }

  /** Recursive live-tree walk: data files as root-relative paths,
    * skipping control/hidden names at every level — the bootstrap
    * manifest of a tree written before the manifest layer existed. */
  def treeDataFiles(fs: FileSystem, root: Path): Seq[String] = {
    def walk(dir: Path, prefix: String): Seq[String] =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath, s"$prefix$n/")
        else Seq(s"$prefix$n")
      }
    walk(root, "").sorted
  }

  /** Latest manifest, or bootstrap-commit one from the tree (adopting
    * a pre-manifest index in place). */
  def ensure(fs: FileSystem, root: Path, retain: Int): State =
    latest(fs, root).getOrElse {
      val files = treeDataFiles(fs, root)
      val seq = commit(fs, root, files, retain)
      State(seq, files)
    }

  /** The `bucket=<id>` partition value of a relative data-file path. */
  def bucketOf(rel: String): Option[Int] =
    rel.split('/').collectFirst {
      case seg if seg.startsWith("bucket=") => seg.stripPrefix("bucket=").toInt
    }

  /** Record files dropped by manifest `seq` for deferred deletion.
    * Idempotent like [[commitAt]] — an intent-log replay whose first
    * attempt crashed AFTER the gc ledger landed must SKIP the write,
    * not re-attempt the tmp-rename onto the existing `gc-<seq>`:
    * HDFS-semantics filesystems (the deployment target) fail a rename
    * onto an existing destination, which would wedge recovery at the
    * require (local POSIX rename happens to overwrite, which is why
    * only a cluster would have seen it). */
  def gcRecord(fs: FileSystem, root: Path, seq: Long, files: Seq[String]): Unit =
    if (files.nonEmpty && !fs.exists(new Path(controlDir(root), "gc-%019d".format(seq))))
      commitFile(fs, root, "gc-%019d".format(seq), files.sorted.mkString("\n"))

  /** Physically delete files whose manifest window has expired: gc-<s>
    * lists files live only in manifests < s, so they are unreachable
    * once the retained window has moved past s−1 (latest − retain ≥ s
    * − 1). Empty parent dirs are removed up to the root. */
  def gcSweep(fs: FileSystem, root: Path, retain: Int): Unit = {
    val latestSeq = latest(fs, root).map(_.seq).getOrElse(return)
    control(fs, root, GcName).foreach { case (seq, p) =>
      if (latestSeq - retain >= seq - 1) {
        FsUtils.readUtf8(fs, p).split("\n").iterator.filter(_.nonEmpty).foreach { rel =>
          val f = new Path(root, rel)
          if (fs.exists(f)) fs.delete(f, false)
          // sweep now-empty partition dirs (cosmetic for listers)
          var d = f.getParent
          while (d != null && d != root && fs.exists(d) &&
                 fs.listStatus(d).isEmpty) { fs.delete(d, false); d = d.getParent }
        }
        fs.delete(p, false)
      }
    }
  }

  /** Serialize + atomically land the intent log, BEFORE any of it runs. */
  def writeIntent(fs: FileSystem, root: Path, seq: Long, ops: Seq[Op],
                  manifestFiles: Seq[String], gcFiles: Seq[String]): Unit = {
    val b = new StringBuilder
    b ++= s"SEQ\t$seq\n"
    ops.foreach {
      case Mv(s, d) => b ++= s"MV\t$s\t$d\n"
      case Rm(p)    => b ++= s"RM\t$p\n"
    }
    manifestFiles.foreach(f => b ++= s"MF\t$f\n")
    gcFiles.foreach(f => b ++= s"GC\t$f\n")
    commitFile(fs, root, "pending-intent", b.result())
  }

  /** Execute (or re-execute after a crash) the pending intent log.
    * Every step is idempotent; the log is removed only after the last
    * step, so a crash anywhere re-runs from a consistent state. */
  def runIntent(fs: FileSystem, root: Path, retain: Int): Boolean = {
    val ip = intentPath(root)
    if (!fs.exists(ip)) return false
    val lines = FsUtils.readUtf8(fs, ip).split("\n").toSeq.filter(_.nonEmpty)
    val seq = lines.collectFirst { case l if l.startsWith("SEQ\t") =>
      l.stripPrefix("SEQ\t").toLong }.getOrElse(
      throw new IllegalStateException(s"corrupt intent log at $ip"))
    lines.foreach { l =>
      l.split("\t") match {
        case Array("MV", s, d) =>
          val (src, dst) = (new Path(root, s), new Path(root, d))
          if (fs.exists(src))
            require(fs.rename(src, dst), s"intent rename failed: $src -> $dst")
          // else: already renamed on a previous attempt
        case _ => ()
      }
    }
    val mf = lines.collect { case l if l.startsWith("MF\t") => l.stripPrefix("MF\t") }
    commitAt(fs, root, seq, mf)
    val gc = lines.collect { case l if l.startsWith("GC\t") => l.stripPrefix("GC\t") }
    gcRecord(fs, root, seq, gc)
    lines.foreach { l =>
      l.split("\t") match {
        case Array("RM", p) =>
          val f = new Path(root, p)
          if (fs.exists(f)) fs.delete(f, true)
        case _ => ()
      }
    }
    prune(fs, root, retain)
    fs.delete(ip, false)
    true
  }
}
