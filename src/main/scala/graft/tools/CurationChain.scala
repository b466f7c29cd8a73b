package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bench.QueryMetricsListener

/** End-to-end curation-chain drill (r14 verdict directive #7): the
  * realistic training-data pipeline composed as ONE chained run —
  *
  *   ingest → Gopher quality rules (q147) → exact dedup (q25 shape) →
  *   fuzzy dedup (q26/q58) → decontaminate vs held-out bench (q71) →
  *   mixture sample (q59) → balanced shards (q125)
  *
  * where each stage consumes the PREVIOUS stage's survivors (operators
  * are gated in isolation; what isolation can't show is a stage handing
  * the next one a pathological distribution — e.g. dedup concentrating
  * the doc-length histogram the shard balancer then packs). Each stage
  * materializes its survivors to parquet in `workDir` (the checkpoint a
  * production chain would also write between stages, and what makes
  * per-stage wall + shuffle metrics separable), with wall seconds and
  * the [[QueryMetricsListener]] figures recorded per stage — shuffle
  * ROWS are the scale invariant to compare across fixtures: a stage
  * whose shuffle rows grow super-linearly in corpus rows is the stage
  * that dies first at 100×, whatever the wall clock says that day.
  *
  *   ./run_local.sh graft.tools.CurationChain <sfDir> <workDir>
  */
object CurationChain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurationChain <sfDir> <workDir>")
    val dir = args(0)
    val work = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mx = QueryMetricsListener.install(spark)

    def stage(name: String)(body: => DataFrame): DataFrame = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      mx.reset()
      val t0 = System.nanoTime()
      val out = body
      out.write.mode("overwrite").parquet(s"$work/$name")
      val dt = (System.nanoTime() - t0) / 1e9
      val m = mx.read(spark)
      val back = spark.read.parquet(s"$work/$name")
      val rows = back.count()
      println(f"[chain] $name%-14s ${dt}%8.2f s  rows_out=$rows%-9d " +
        f"shuffle_rows=${m.shuffleRows}%-12d shuffleMB=${(m.shuffleReadBytes + m.shuffleWriteBytes) / 1e6}%9.0f " +
        f"spillMB=${(m.spillMemBytes + m.spillDiskBytes) / 1e6}%8.0f peakTaskMB=${m.peakTaskMemBytes / 1e6}%6.0f")
      back
    }

    val docs = graft.core.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
    import graft.ops.{Dedup, Sampling, TextProfile}

    // 1. quality: Gopher rules, keep docs passing the STRUCTURAL rules.
    //    The two language-bound rules (alpha-word fraction, stopword
    //    hits) are out-of-domain on the synthetic fixture — its scaled
    //    vocabulary is `wNN` tokens, so they reject ~everything and
    //    would leave the rest of the chain nothing to measure. The
    //    operator itself is the gated q147; the chain needs its rules
    //    applied with the fixture's domain in mind, exactly as a real
    //    pipeline tunes rule sets per corpus.
    val quality = stage("quality") {
      val verdicts = TextProfile.gopherRules(docs, "doc_id", "text")
        .filter(col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet_lines") && col("r_ellipsis_lines"))
        .select(col("doc_id"))
      docs.join(verdicts, Seq("doc_id"), "left_semi")
    }

    // 2. exact dedup: keep each fingerprint's canonical (min-id) member
    val exact = stage("exact_dedup") {
      val keep = Dedup.exactGroups(quality, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
      quality.join(keep, Seq("doc_id"), "left_semi")
    }

    // 3. fuzzy dedup: shingle-Jaccard pairs → components → canonical.
    //    The candidate-pair exchange is the chain's ONLY super-linear
    //    shuffle (bounded by Σ min(df,cap)²/2 — the DedupDrill
    //    invariant), and at sf10 it put ~26M rows on each of 32
    //    partitions (1.3 GB spill, 1.0 GB peak task). A chained
    //    pipeline can afford the invariant pass (one shingle scan,
    //    small next to the pair stage itself) and size the stage's
    //    shuffle from it — the ShuffleSizing floor-only rule the graph
    //    family already runs on.
    val fuzzy = {
      val inv = graft.ops.Dedup.shingleIndex(exact, "doc_id", "text", 3, maxDf = 0)
        .groupBy(col("shingle")).agg(least(count(lit(1)), lit(1000L)).as("df"))
        .agg(coalesce(sum(col("df") * col("df")), lit(0L)).as("s"))
        .head().getLong(0)
      println(s"[chain] fuzzy invariant sum_min_df_cap_sq=$inv")
      graft.ops.ShuffleSizing.withEdgeScaledShuffle(spark, inv / 2) {
        stage("fuzzy_dedup") {
          val pairs = Dedup.jaccardPairs(exact, "doc_id", "text",
            n = 3, thresholdNum = 6, thresholdDen = 10, maxDf = 1000)
          Dedup.dedupCorpus(exact, "doc_id", pairs)
        }
      }
    }

    // 4. decontaminate: drop survivors fuzzily matching the held-out
    //    bench slice (doc_id % 10 == 0 of the ORIGINAL corpus — fixed
    //    before curation, as a real benchmark set would be)
    val decon = stage("decontaminate") {
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val corpus = fuzzy.filter(col("doc_id") % 10 =!= 0)
      val hits = Dedup.crossMinhashMatches(corpus, bench,
        "doc_id", "text", threshold = 0.35, k = 32)
        .select(col("doc_id")).distinct()
      corpus.join(hits, Seq("doc_id"), "left_anti")
    }

    // 5. mixture: per-source sampling percentages (q59's grid)
    val mixed = stage("mixture") {
      val picked = Sampling.mixtureSample(
        decon.select(col("doc_id"), col("source")), "source", "doc_id",
        Map("src0" -> 80, "src1" -> 50, "src2" -> 25), defaultPct = 10)
        .select(col("doc_id"))
      decon.join(picked, Seq("doc_id"), "left_semi")
    }

    // 6. shards: deterministic balanced training order
    stage("shards") {
      Sampling.balancedShards(
        mixed.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", shards = 8)
        .select(col("doc_id"), col("n_chars"), col("shard"))
    }

    // fingerprint of the final assignment so two fixtures/runs compare
    val fp = spark.read.parquet(s"$work/shards")
      .agg(count(lit(1)).as("n"), sum(col("doc_id") * (col("shard") + 1)).as("chk"))
      .head()
    println(s"[chain] final n=${fp.getLong(0)} checksum=${fp.getLong(1)}")
    spark.stop()
  }
}
