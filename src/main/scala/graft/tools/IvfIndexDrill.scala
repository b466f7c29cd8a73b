package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale drill for the on-disk IVF index family (r15 verdict directive
  * #3): prove the file-level-pruning claim of
  * [[graft.functions.VectorFunctions.ivfIndexTopK]] with EXECUTION
  * metrics, not plan text — build the index once, search the same
  * query set at nprobe ∈ {1,2,4,8,...}, and record per rung the wall
  * time, the scan's input bytes/records (task InputMetrics via
  * [[graft.bench.QueryMetricsListener]]), and the number/size of files
  * the scan selected (FileSourceScanExec metrics). If pruning holds,
  * input bytes scale with the PROBED BUCKETS, not with the corpus; at
  * nprobe = C the search degenerates to a full scan and the bytes must
  * approach the on-disk index size (the built-in control).
  *
  *   ./run_local.sh graft.tools.IvfIndexDrill <sfDir> <indexDir> [k] [nprobes...]
  *
  * The index at <indexDir> is built (and timed) when absent, reused
  * when present — at sf10 the build is the expensive leg and the rungs
  * are what get repeated. */
object IvfIndexDrill {
  import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val idx = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val nprobes = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions
    val emb = graft.core.Tables.table(spark, dir, "embeddings")
    val centroids = VectorFunctions.centroidsByLabel(emb, "label", "embedding")
      .localCheckpoint()
    val nBuckets = centroids.count()
    val root = new java.io.File(idx)
    if (!root.exists() || root.listFiles() == null || root.listFiles().isEmpty) {
      val t0 = System.nanoTime()
      VectorFunctions.writeIvfIndex(emb, "vec_id", "embedding", centroids, idx)
      println(f"[ivfdrill] build ${(System.nanoTime() - t0) / 1e9}%.1f s -> $idx")
    } else println(s"[ivfdrill] reusing index at $idx")
    def du(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(du).sum else f.length()
    val idxBytes = du(root)
    println(s"[ivfdrill] index: $idxBytes bytes, $nBuckets buckets, corpus rows=${emb.count()}")
    // fixed SMALL query set, pinned so every rung searches identical
    // queries — small on purpose: probed buckets = UNION over queries,
    // so a large query set covers every bucket even at nprobe=1 and
    // the pruning signal vanishes (first drill attempt: 32 queries ×
    // 10 buckets read the full corpus at every rung)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val mx = graft.bench.QueryMetricsListener.install(spark)
    println(f"[ivfdrill] ${"nprobe"}%-7s ${"wall_med3"}%-10s ${"in_MB"}%-9s " +
      f"${"in_rows"}%-10s ${"files"}%-6s ${"files_MB"}%-9s ${"idx_MB"}%-8s rows")
    nprobes.foreach { np =>
      val runs = (1 to 3).map { _ =>
        mx.reset()
        val t0 = System.nanoTime()
        val df: DataFrame = VectorFunctions.ivfIndexTopK(spark, idx, queries,
          centroids, "vec_id", "embedding", k, np)
        // collect, not count: count() plans a SEPARATE query execution,
        // leaving this df's scan metrics (numFiles/filesSize) unfilled;
        // the result is top-k-bounded, so the collect is model-sized
        val n = df.collect().length.toLong
        val dt = (System.nanoTime() - t0) / 1e9
        val m = mx.read(spark)
        val sc = scans(df.queryExecution.executedPlan)
          .filter(_.metrics.contains("numFiles"))
        if (sys.env.get("GRAFT_IVFDRILL_PLAN").contains("1"))
          System.err.println(df.queryExecution.executedPlan.toString.take(4000))
        val nf = sc.map(_.metrics("numFiles").value).sum
        val fb = sc.map(s => s.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
        (dt, m.inputBytesRead, m.inputRecordsRead, nf, fb, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      val r = runs.last
      println(f"[ivfdrill] $np%-7d $med%-10.2f ${r._2 / 1e6}%-9.1f ${r._3}%-10d " +
        f"${r._4}%-6d ${r._5 / 1e6}%-9.1f ${idxBytes / 1e6}%-8.1f ${r._6}")
    }

    // ---- the BATCH leg (r16 verdict directive #1): a wide query set
    // probes the union of buckets, so the monolithic search reads ~all
    // files at every rung — the production shape where per-query
    // pruning vanished in the first drill. Grouped routing
    // (ivfIndexTopKGrouped) gives each probe-set group its own scan;
    // recorded per rung: ungrouped files/bytes vs the grouped plan's
    // per-scan maximum and total, plus walls and the equality check.
    val batch = emb.filter(col("vec_id") < 32)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val totalFiles = {
      val root2 = new org.apache.hadoop.fs.Path(idx)
      val fs = root2.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.functions.IvfManifest.latest(fs, root2).map(_.files.size.toLong)
        .getOrElse(-1L)
    }
    println(s"[ivfdrill] batch leg: 32 queries, $totalFiles live index files")
    println(f"[ivfdrill] ${"nprobe"}%-7s ${"mono_s"}%-8s ${"mono_files"}%-11s " +
      f"${"mono_MB"}%-9s ${"grp_s"}%-8s ${"grp_scans"}%-10s ${"grp_maxf"}%-9s " +
      f"${"grp_sumf"}%-9s ${"grp_MB"}%-8s ${"cap8_s"}%-8s ${"cap8_scans"}%-10s " +
      f"${"cap8_sumf"}%-9s equal")
    nprobes.foreach { np =>
      def measure(df: DataFrame): (Double, Long, Long, Seq[Long]) = {
        mx.reset()
        val t0 = System.nanoTime()
        df.collect(): Unit
        val dt = (System.nanoTime() - t0) / 1e9
        val m = mx.read(spark)
        val perScan = scans(df.queryExecution.executedPlan)
          .filter(_.relation.location.rootPaths.exists(_.toString.contains(idx)))
          .map(_.metrics("numFiles").value)
        (dt, m.inputBytesRead, perScan.sum, perScan)
      }
      def rowsOf(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val mono = VectorFunctions.ivfIndexTopK(spark, idx, batch,
        centroids, "vec_id", "embedding", k, np)
      val grp = VectorFunctions.ivfIndexTopKGrouped(spark, idx, batch,
        centroids, "vec_id", "embedding", k, np)
      val cap8 = VectorFunctions.ivfIndexTopKGrouped(spark, idx, batch,
        centroids, "vec_id", "embedding", k, np, maxScans = 8)
      val (mt, mb, mf, _) = measure(mono)
      val (gt, gb, _, gscans) = measure(grp)
      val (ct, _, _, cscans) = measure(cap8)
      val equal = rowsOf(mono) == rowsOf(grp) && rowsOf(mono) == rowsOf(cap8)
      println(f"[ivfdrill] $np%-7d $mt%-8.2f $mf%-11d ${mb / 1e6}%-9.1f " +
        f"$gt%-8.2f ${gscans.size}%-10d ${if (gscans.isEmpty) 0L else gscans.max}%-9d " +
        f"${gscans.sum}%-9d ${gb / 1e6}%-8.1f " +
        f"$ct%-8.2f ${cscans.size}%-10d ${cscans.sum}%-9d $equal")
    }
    spark.stop()
  }
}
