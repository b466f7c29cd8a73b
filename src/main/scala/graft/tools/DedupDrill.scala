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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
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

    def run(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.count() // warm
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      stages.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      val rows = f.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[ddrill] $label%-24s n=$n ${dt}%8.2f s  rows=$rows%-9d stages=${stages.get}%-4d shuffleMB=${shuffleWrite.get / 1e6}%.0f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }

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
    spark.stop()
  }
}
