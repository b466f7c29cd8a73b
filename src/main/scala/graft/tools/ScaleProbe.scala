package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the heavy operator families: runs the
  * dedup/ANN pipelines on k× perturbed copies of the sf corpus and
  * reports wall times, so PLANS.md's "linear in corpus size" claims are
  * measured, not asserted.
  *
  * Perturbation keeps the *structure* linear: every token is suffixed
  * with the copy index (disjoint shingle spaces ⇒ no cross-copy
  * near-dup pairs ⇒ output size grows k×, like a real corpus), and
  * embedding copies get a per-copy deterministic element-wise nudge
  * (keeps vectors distinct while preserving bucket geometry).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", 1000)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val ks = Seq(1, 2, 4, 8)

    // id stride between perturbed copies; a multiple of every modulus
    // used below (e.g. the % 20 bench slice), so per-copy id arithmetic
    // is copy-aligned
    val CopyStride = 10000000L
    def copies(base: DataFrame, k: Int, idCol: String, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map { i =>
        f(base.withColumn(idCol, col(idCol) + lit(i.toLong * CopyStride)), i)
      }.reduce(_ unionByName _)

    val docs0 = graft.core.Tables.table(spark, dir, "documents")
    val emb0 = graft.core.Tables.table(spark, dir, "embeddings")
    val embDim = emb0.select(size(col("embedding"))).head().getInt(0)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    for (k <- ks) {
      val docs = copies(docs0, k, "doc_id",
        (d, i) => d.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1_c" + i)))
        .localCheckpoint(true) // isolate input materialisation from the measured op
      // per-copy deterministic sign-flip pattern = an orthogonal
      // transform: geometry within a copy is preserved, cross-copy
      // cosines decorrelate (a constant shift would instead pull all
      // copies toward the same direction and fabricate near-dup pairs)
      val emb = copies(emb0, k, "vec_id",
        (d, i) => d.withColumn("embedding",
          zip_with(col("embedding"),
            typedlit((0 until embDim).map(p =>
              if ((scala.util.hashing.MurmurHash3.productHash((p, i)) & 1) == 0) 1.0f else -1.0f)),
            (x, s) => x * s)))
        .localCheckpoint(true)

      val (tJac, nJac) = time(graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 6, 10, 1000).count())
      val (tMin, nMin) = time(graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text", 0.5, k = 32).count())
      val (tSim, nSim) = time(graft.ops.Dedup.simhashNearDups(docs, "doc_id", "text", 3).count())
      val (tCos, nCos) = time(graft.ops.Dedup.cosineNearDups(emb, "vec_id", "embedding", 0.4).count())
      val (tCosIvf, nCosIvf) = time {
        val cents = graft.functions.VectorFunctions.centroidsByLabel(emb, "label", "embedding")
        graft.ops.Dedup.cosineNearDupsIVF(emb, "vec_id", "embedding", cents, 0.4, nprobe = 2).count()
      }
      val (tKnn, nKnn) = time {
        val cents = graft.functions.VectorFunctions.centroidsByLabel(emb, "label", "embedding")
        graft.functions.VectorFunctions.ivfTopK(
          emb.filter(col("vec_id") < 10), emb, cents, "vec_id", "embedding", 5, 3).count()
      }
      // decontamination: bench side stays FIXED (copy 0's % 20 slice —
      // same token space as copy 0, so hits stay constant) while the
      // corpus grows k× — the broadcast-join shape should scale with
      // the corpus scan alone
      val (tDec, nDec) = time(graft.ops.Decontaminate.contamination(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") < CopyStride && col("doc_id") % 20 === 0),
        "doc_id", "text", 5).count())
      // round-8 ops. Pairs are materialised once so the split/keep-best
      // timings isolate THEIR cost, not a jaccard re-run (measured
      // above). BM25 query terms live in copy 0's token space — copies
      // 1..k-1 contribute corpus-side cost (explode/lens/tf filter, the
      // dominant term) without matches, which is the scaling under test.
      val pairsM = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 6, 10, 1000)
        .localCheckpoint(true)
      val compsM = graft.ops.Dedup.connectedComponents(pairsM).localCheckpoint(true)
      val (tLsp, nLsp) = time(graft.ops.Sampling.leakageSafeSplit(
        docs.select(col("doc_id")), "doc_id", compsM).count())
      val (tBest, nBest) = time(graft.ops.Dedup.dedupCorpusKeepBest(
        docs.select(col("doc_id"), col("n_chars")), "doc_id", pairsM,
        Seq(col("n_chars").desc)).count())
      val (tBm, nBm) = time(graft.ops.Bm25.bm25E4(
        docs, "doc_id", "text", Seq("spark_c0", "hash_c0", "join_c0")).count())
      // incremental fuzzy dedup: the INDEX stays fixed (copy 0's
      // %20!=0 docs, in the SAME perturbed token space as the batch so
      // copy-0 batch docs genuinely hit the index — the measured cost
      // includes real cross-match traffic, as the decontamination probe
      // does) while the arrival batch grows k× — the stationary-index
      // claim means cost should track the batch (one signature job +
      // broadcast probes) on top of a constant index-side signature
      // pass; cap raised so the whole series stays on the broadcast path
      val (tInc, nInc) = time(graft.ops.Dedup.incrementalFuzzyDedup(
        docs.filter(col("doc_id") < CopyStride && col("doc_id") % 20 =!= 0)
          .select(col("doc_id"), col("text")),
        docs.filter(col("doc_id") % 20 === 0).select(col("doc_id"), col("text")),
        "doc_id", "text", 0.5, k = 32, maxBroadcastBatchDocs = 200000).count())
      println(f"[scale] k=$k%-2d docs=${5000L * k}%-6d " +
        f"jaccard=$tJac%6.2fs($nJac) minhash=$tMin%6.2fs($nMin) " +
        f"simhash=$tSim%6.2fs($nSim) cosine=$tCos%6.2fs($nCos) " +
        f"cosivf=$tCosIvf%6.2fs($nCosIvf) ivf=$tKnn%6.2fs($nKnn) " +
        f"decon=$tDec%6.2fs($nDec) lsplit=$tLsp%6.2fs($nLsp) " +
        f"keepbest=$tBest%6.2fs($nBest) bm25=$tBm%6.2fs($nBm) " +
        f"incfuzzy=$tInc%6.2fs($nInc)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
