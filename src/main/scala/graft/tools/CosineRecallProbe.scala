package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Detection-quality probe for the embedding near-dup family — the
  * cosine twin of [[MinhashRecallProbe]]: on the real embeddings table,
  * compare the SRP-LSH (q38) and IVF (q50) candidate generators against
  * BRUTE-FORCE cosine ground truth at a grid of thresholds and
  * parameters. Both operators verify candidates with the exact codegen'd
  * cosine before thresholding, so precision is 1.0 by construction —
  * the number that can degrade is RECALL (a true pair never sharing an
  * SRP block / probed centroid is never verified). Prints recall vs
  * maxHamming (SRP) and nprobe (IVF) — the evidence behind the shipped
  * defaults. */
object CosineRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val emb = graft.core.Tables.table(spark, dir, "embeddings")
    import graft.functions.{VecExpressions, VectorFunctions => VF}
    VecExpressions.register(spark)

    // ground truth: ALL pairs >= t by exact cosine (quadratic — probe
    // scale only; this is precisely what the operators exist to avoid)
    val l = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val r = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val allPairs = l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VF.cosineNative(col("v_a"), col("v_b")).as("c"))
    allPairs.persist()
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSet

    for (t <- Seq(0.4, 0.6)) {
      val truth = pairSet(allPairs.filter(col("c") >= t))
      for (mh <- Seq(7, 11, 14)) {
        val got = pairSet(graft.ops.Dedup.cosineNearDups(
          emb, "vec_id", "embedding", minCosine = t, maxHamming = mh))
        val rec = if (truth.isEmpty) 1.0 else (truth & got).size.toDouble / truth.size
        println(f"SRP  t=$t%.2f maxHamming=$mh%2d truth=${truth.size}%5d surfaced=${got.size}%5d recall=$rec%.3f")
      }
      val centroids = VF.centroidsByLabel(emb, "label", "embedding")
      for (np <- Seq(1, 2, 4)) {
        val got = pairSet(graft.ops.Dedup.cosineNearDupsIVF(
          emb, "vec_id", "embedding", centroids, minCosine = t, nprobe = np))
        val rec = if (truth.isEmpty) 1.0 else (truth & got).size.toDouble / truth.size
        println(f"IVF  t=$t%.2f nprobe=$np%2d     truth=${truth.size}%5d surfaced=${got.size}%5d recall=$rec%.3f")
      }
    }

    // The real embeddings have ~no pairs above cosine 0.6 at this SF,
    // so the grid above cannot measure recall where near-DUP detection
    // actually runs (0.85+, the SemDeDup regime). PLANT dup pairs: a
    // deterministic jitter (v'_i = v_i + 0.35 * v_rev_i, new id =
    // id + 1e6, label kept) lands pairs around cosine ~0.85-0.95;
    // recall is then measured over planted pairs that truly clear the
    // threshold by exact cosine.
    val jit = emb.filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (a, b) => a + lit(0.35f) * b).as("embedding"),
        col("label"))
    val aug = emb.select("vec_id", "embedding", "label").unionByName(jit)
    val plantedTruth = pairSet(
      emb.filter(col("vec_id") % 4 === 0)
        .select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
        .join(jit.select((col("vec_id") - 1000000L).as("id_a"),
          col("embedding").as("v_b")), Seq("id_a"))
        .select(col("id_a"), (col("id_a") + 1000000L).as("id_b"),
          VF.cosineNative(col("v_a"), col("v_b")).as("c"))
        .filter(col("c") >= 0.85))
    for (mh <- Seq(7, 11, 14)) {
      val got = pairSet(graft.ops.Dedup.cosineNearDups(
        aug, "vec_id", "embedding", minCosine = 0.85, maxHamming = mh))
      val rec = if (plantedTruth.isEmpty) 1.0
        else (plantedTruth & got).size.toDouble / plantedTruth.size
      println(f"SRP  planted t=0.85 maxHamming=$mh%2d planted=${plantedTruth.size}%5d recall=$rec%.3f")
    }
    val augCentroids = VF.centroidsByLabel(aug, "label", "embedding")
    for (np <- Seq(1, 2, 4)) {
      val got = pairSet(graft.ops.Dedup.cosineNearDupsIVF(
        aug, "vec_id", "embedding", augCentroids, minCosine = 0.85, nprobe = np))
      val rec = if (plantedTruth.isEmpty) 1.0
        else (plantedTruth & got).size.toDouble / plantedTruth.size
      println(f"IVF  planted t=0.85 nprobe=$np%2d     planted=${plantedTruth.size}%5d recall=$rec%.3f")
    }

    // ---- IVF SEARCH recall@k vs brute force (r10 directive #7) ----
    // The q30-family top-k path: recall@k = |ivf ∩ brute| / |brute|
    // over a deterministic query slice, at the k-means quantizer the
    // shipped q30 uses, across the nprobe ladder. This is the ANN
    // quality/cost trade-off as a recorded number: each +probe
    // multiplies the scanned bucket volume by ~nprobe/C while recall
    // climbs toward 1.
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val kk = 10
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(rw => (rw.getLong(0), rw.getLong(1))).toSet
    val truthK = topSet(VF.bruteForceTopK(queries, emb, "vec_id", "embedding", kk))
    val km = VF.kmeansCentroids(emb, "vec_id", "embedding", k = 16, iters = 3)
      .localCheckpoint()
    for (np <- Seq(1, 2, 4, 8)) {
      val t0 = System.nanoTime()
      val got = topSet(VF.ivfTopK(queries, emb, km, "vec_id", "embedding", kk, np))
      val sec = (System.nanoTime() - t0) / 1e9
      val rec = if (truthK.isEmpty) 1.0 else (truthK & got).size.toDouble / truthK.size
      println(f"IVF-topk k=$kk nprobe=$np%2d queries=${queries.count()}%4d " +
        f"recall@$kk=$rec%.3f sec=$sec%6.2f")
    }

    // r11 directive #9: the AUTO operating points — what
    // calibrateNprobe picks for a target recall, with the measured
    // sampled-recall ladder it walked (the PLANS.md table)
    for (target <- Seq(0.5, 0.7, 0.9, 1.0)) {
      val t0 = System.nanoTime()
      val cal = VF.calibrateNprobe(emb, km, "vec_id", "embedding",
        k = kk, targetRecall = target, sampleSize = 50)
      val sec = (System.nanoTime() - t0) / 1e9
      val lad = cal.ladder.map(p => f"${p.nprobe}→${p.recall}%.2f").mkString(" ")
      println(f"IVF-auto target=$target%.2f chosen nprobe=${cal.nprobe}%2d " +
        f"achieved=${cal.achieved}%.3f calSec=$sec%6.2f ladder: $lad")
    }
    spark.stop()
  }
}
