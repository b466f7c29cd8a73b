package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** The dedup-family leg of the sf10 scale drill, shingle width as an
  * argument: the gated chain (q26/q44/q58/q111/q162 shapes) pinned at
  * n = 3 saturates on the GenSf bounded-vocab corpus at sf10 — the
  * 31-word vocabulary exhausts the 31³ shingle space, per-shingle df
  * then grows LINEARLY with the corpus, and the candidate invariant
  * Σ min(df, maxDf)² grows quadratically (measured: 2.39e8 at sf1 →
  * 2.36e10 at sf10, 98× for 10× rows — the ENOSPC kill of the first
  * sf10 attempt). On a shingle-saturated corpus the operator knob is
  * DISCRIMINATION (n), not the df cap (maxDf = 300 leaves zero live
  * shingles at sf10): n = 5 re-spreads df (16.9M shingles, max df 10,
  * Σdf² = 4.8e7) and the chain scales linearly again. This tool runs
  * the chain at the given n on any fixture so sf1 → sf10 is measured
  * apples-to-apples.
  *
  *   ./run_local.sh graft.tools.DedupDrill <sfDir> <n>
  */
object DedupDrill {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    // GRAFT_DDRILL_STAGES=1: per-stage dissection (the Drill flag) —
    // where a leg's wall goes, stage by stage
    val dissect = sys.env.get("GRAFT_DDRILL_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        if (dissect) {
          val si = sc.stageInfo
          val secs = (for { s <- si.submissionTime; c <- si.completionTime }
            yield (c - s) / 1e3).getOrElse(0.0)
          if (secs >= 2.0) {
            val tm = si.taskMetrics
            println(f"[stage] id=${si.stageId}%-5d ${secs}%7.1fs tasks=${si.numTasks}%-4d " +
              f"swRows=${tm.shuffleWriteMetrics.recordsWritten}%-11d " +
              f"srRows=${tm.shuffleReadMetrics.recordsRead}%-11d " +
              f"spillMB=${tm.diskBytesSpilled / 1e6}%6.0f " +
              si.name.takeWhile(_ != '\n').take(70))
          }
        }
      }
    })
    val docs = graft.core.Tables.table(spark, dir, "documents")
    import graft.ops.Dedup
    def pairs() = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = n, thresholdNum = 6, thresholdDen = 10, maxDf = 1000)

    // the operator's candidate-volume invariant at this fixture/n:
    // Σ min(df, maxDf)² over distinct n-gram shingles — candidate pair
    // generation work is bounded by (half) this sum, so it must scale
    // sublinearly-in-square on a healthy (Zipf-vocab) corpus
    val inv = graft.ops.Dedup.shingleIndex(docs, "doc_id", "text", n, maxDf = 0)
      .groupBy(col("shingle")).agg(least(count(lit(1)), lit(1000L)).as("df"))
      .agg(count(lit(1)).as("shingles"), max(col("df")).as("max_df"),
        sum(col("df") * col("df")).as("sum_df2"))
      .head()
    println(s"[ddrill] invariant n=$n shingles=${inv.getLong(0)} " +
      s"max_capped_df=${inv.getLong(1)} sum_min_df_cap_sq=${inv.getLong(2)}")

    // shuffle ROWS via the bench listener (r16): rows are the
    // run-independent signal the adjudication discipline pins; the
    // stage count/bytes above stay for continuity with the r12 tables
    val mx = graft.bench.QueryMetricsListener.install(spark)
    def run(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.count() // warm
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      stages.set(0); shuffleWrite.set(0); mx.reset()
      val t0 = System.nanoTime()
      val rows = f.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val m = mx.read(spark)
      Thread.sleep(300)
      println(f"[ddrill] $label%-28s n=$n ${dt}%8.2f s  rows=$rows%-9d stages=${stages.get}%-4d " +
        f"shuffleMB=${shuffleWrite.get / 1e6}%.0f shuffle_rows=${m.shuffleRows}%-12d spillMB=${m.spillDiskBytes / 1e6}%.0f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }

    // GRAFT_DDRILL_ONLY=basket: skip straight to the basket CC legs
    // (re-dissecting them must not pay the 15-minute chain re-run)
    val basketOnly = sys.env.get("GRAFT_DDRILL_ONLY").contains("basket")
    if (!basketOnly) {
    run("jaccard_pairs (q26)")(pairs())
    run("dup_components (q44)")(Dedup.connectedComponents(pairs()))
    run("dedup_corpus (q58)")(
      Dedup.dedupCorpus(docs.select(col("doc_id"), col("lang")), "doc_id", pairs()))
    run("leakage_split (q111)")(graft.ops.Sampling.leakageSafeSplit(
      docs.select(col("doc_id")), "doc_id", Dedup.connectedComponents(pairs())))
    run("incr_components (q162)") {
      val p = pairs().select(col("id_a"), col("id_b"))
      val standing = Dedup.connectedComponents(
        p.filter(col("id_a") % 10 < 8 && col("id_b") % 10 < 8))
      Dedup.incrementalComponents(standing,
        p.filter(col("id_a") % 10 >= 8 || col("id_b") % 10 >= 8))
    }

    // CC in ISOLATION, A/B on the r16 exchange-free recipe: the pair
    // list is pre-materialized (its generation cost is the q26 leg,
    // not CC's), distributed rounds forced. Leg A is the default
    // localCheckpoint path — S-partitioned edge capture + broadcast
    // label side, the exchange-free rounds. Leg B is the reliable
    // parquet-cut path, which structurally keeps the PRIOR shuffling
    // per-round plan (scratch parquet can't carry partitioning) — the
    // same round exchanges the pre-r16 code planned, so its
    // shuffle_rows line is the before-number for the recipe's delta.
    // parquet, not localCheckpoint: run()'s between-run cleanup
    // unpersists every registered RDD, which would strand a checkpoint
    val ccDir = java.nio.file.Files.createTempDirectory("ddrill-ccpairs").toString
    pairs().select(col("id_a"), col("id_b")).write.mode("overwrite").parquet(ccDir)
    val ccPairs = spark.read.parquet(ccDir)
    println(s"[ddrill] cc pairs=${ccPairs.count()}")
    run("cc_rounds exchange-free")(
      Dedup.connectedComponents(ccPairs, driverMaxEdges = 0))
    run("cc_rounds parquet-cut (prior plan)")(
      Dedup.connectedComponents(ccPairs, driverMaxEdges = 0,
        checkpointDir = Some(java.nio.file.Files
          .createTempDirectory("ddrill-cc").toString + "/run")))
    } // !basketOnly

    // CC at GRAPH scale: the fixture's planted near-dup pair lists are
    // tiny (88 at sf1 / 838 at sf10 — driver union-find territory), so
    // the distributed rounds the r16 recipe rewrites need a genuinely
    // large edge relation. The co-purchase basket graph (q137's input,
    // millions of edges at sf1) is the stand-in for "dedup clusters at
    // 100 TB": same round shape, |E| >> |V|. Edge generation is
    // materialized to parquet first (its cost is the basket self-join,
    // not CC's) — the legs measure the rounds alone.
    val bDir = java.nio.file.Files.createTempDirectory("ddrill-basket").toString
    graft.ops.BasketEdges.edges(
        graft.core.Tables.table(spark, dir, "lineitem"), "l_orderkey", "l_partkey")
      .select(col("src").as("id_a"), col("dst").as("id_b"))
      .write.mode("overwrite").parquet(bDir)
    val basket = spark.read.parquet(bDir)
    println(s"[ddrill] basket edges=${basket.count()}")
    run("cc_basket exchange-free")(
      Dedup.connectedComponents(basket, assumeSymmetric = true))
    run("cc_basket parquet-cut (prior plan)")(
      Dedup.connectedComponents(basket, assumeSymmetric = true,
        checkpointDir = Some(java.nio.file.Files
          .createTempDirectory("ddrill-ccb").toString + "/run")))
    spark.stop()
  }
}
