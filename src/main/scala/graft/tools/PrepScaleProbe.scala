package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-10 data-prep operators (z-order layout,
  * bigram-LM scoring, balanced shards, DSIR weights): k× perturbed
  * copies of the sf corpus, measured wall times — PLANS.md's linearity
  * claims for these ops are measured here, not asserted.
  *
  * Perturbation follows ScaleProbe: doc copies get copy-suffixed
  * tokens (vocabulary grows k× like a real corpus — the worst case for
  * the LM's model join); order copies get disjoint key ranges. The
  * DSIR target stays FIXED (copy 0's English slice) while raw grows k×
  * — the weight table is O(buckets) by construction, so cost must
  * track the raw-corpus passes alone.
  */
object PrepScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"

    val CopyStride = 10000000L
    def copies(base: DataFrame, k: Int, idCol: String,
               f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map { i =>
        f(base.withColumn(idCol, col(idCol) + lit(i.toLong * CopyStride)), i)
      }.reduce(_ unionByName _)

    val docs0 = graft.core.Tables.table(spark, dir, "documents")
    val orders0 = graft.core.Tables.table(spark, dir, "orders")
    val events0 = graft.core.Tables.table(spark, dir, "events")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    for (k <- Seq(1, 2, 4, 8)) {
      val docs = copies(docs0, k, "doc_id",
        (d, i) => d.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1_c" + i)))
        .localCheckpoint(true)
      val orders = copies(orders0, k, "o_orderkey", (d, _) => d)
        .select(col("o_orderkey"), col("o_custkey").as("x"),
          // epoch at the data minimum: zValue's non-negative contract
          datediff(col("o_orderdate"), lit("1992-01-01").cast("timestamp"))
            .cast("long").as("y"))
        .localCheckpoint(true)

      val (tZ, nZ) = time(graft.ops.Layout.zorderFileStats(
        orders, "o_orderkey", "x", "y", numFiles = 64).count())
      val (tLm, nLm) = time(graft.ops.NgramLm.scoreDocs(docs, "doc_id", "text").count())
      val (tSh, nSh) = time(graft.ops.Sampling.balancedShards(
        docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", 64).count())
      val (tDs, nDs) = time(graft.ops.Dsir.scoreDocs(
        docs, docs.filter(col("doc_id") < CopyStride && col("lang") === "en"),
        "doc_id", "text").count())
      // BPE learns over the distinct-word table: the copy-suffixed
      // tokens grow the vocab k×, the worst case for merge iteration
      val (tBpe, nBpe) = time(
        graft.ops.BpeTrain.learnMerges(docs, "text", nMerges = 4).size.toLong)
      val (tAud, nAud) = time(graft.ops.Expectations.audit(Seq(
        graft.ops.Expectations.expectUnique("u", docs, Seq("doc_id")),
        graft.ops.Expectations.expect("q", docs, length(col("text")) > 0))).count())
      // event-time window family: user count grows k× (copies get
      // disjoint user ranges), per-key series length constant — the
      // per-key-window shape should scale with total events
      val events = copies(events0, k, "event_id",
        (d, i) => d.withColumn("user_id", col("user_id") + lit(i.toLong * CopyStride)))
        .localCheckpoint(true)
      val (tCu, nCu) = time(graft.ops.TimeSeries.cusumChangepoint(
        events, "user_id", "ts", "event_id", floor(col("value") * 100.0)).count())
      val (tPer, nPer) = time(graft.ops.TimeSeries.periodicity(
        events, "user_id", "ts", "event_id", floor(col("value") * 100.0)).count())
      // record linkage: master grows k× with copy-tagged names at BOTH
      // ends (prefix and suffix blocks disjoint across copies — block
      // SIZES stay constant, block COUNT grows), feed stays copy 0's
      // slice with an interior deletion (prefix key intact): cost must
      // track the master scan, never a cross against the grown master
      val parts0 = graft.core.Tables.table(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val masters = copies(parts0, k, "p_partkey",
        (d, i) => d.withColumn("p_name",
          concat(lit(s"z$i"), col("p_name"), lit(s"z$i"))))
        .localCheckpoint(true)
      val feedK = masters.filter(col("p_partkey") < CopyStride && col("p_partkey") % 20 === 0)
        .select((col("p_partkey") + 1000000L).as("fid"),
          concat(substring(col("p_name"), 1, 4),
            col("p_name").substr(lit(6), length(col("p_name")))).as("name"))
      val (tLink, nLink) = time(graft.ops.EntityMatch.linkRecords(
        feedK, "fid", "name", masters, "p_partkey", "p_name",
        maxDist = 2, blockChars = 3).count())
      // multi-field FS linkage under the same regime: master grows k×
      // with copy-tagged name AND type (per-copy blocks disjoint —
      // block sizes constant, block count grows), feed fixed at copy
      // 0's slice with an interior name deletion; the type prefix
      // blocks are genuinely hot (6 shared type families) and the cap
      // drops them, so cost must track the NAME-block candidate
      // volume + the master scan — flat as the master grows
      val mastersMf = copies(graft.core.Tables.table(spark, dir, "part")
          .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_brand")),
          k, "p_partkey",
        (d, i) => d
          .withColumn("p_name", concat(lit(s"z$i"), col("p_name"), lit(s"z$i")))
          .withColumn("p_type", concat(lit(s"z$i"), col("p_type"), lit(s"z$i"))))
        .localCheckpoint(true)
      val feedMf = mastersMf
        .filter(col("p_partkey") < CopyStride && col("p_partkey") % 10 === 0)
        .select((col("p_partkey") + 9000000L).as("fid"),
          concat(substring(col("p_name"), 1, 4),
            col("p_name").substr(lit(6), length(col("p_name")))).as("name"),
          col("p_type").as("ptype"), col("p_brand").as("brand"))
      val FS = graft.ops.EntityMatch.LinkField
      val (tFs, nFs) = time(graft.ops.EntityMatch.linkRecordsMulti(
        feedMf, "fid", mastersMf, "p_partkey", Seq(
          FS("name", "p_name", 2000L, -1500L, maxDist = 2),
          FS("ptype", "p_type", 1500L, -1200L, maxDist = 2),
          FS("brand", "p_brand", 400L, -300L, maxDist = 0, block = false)),
        minScoreMilli = 1000L, maxBlockRows = 3000).count())
      println(f"[prep-scale] k=$k%-2d orders=${orders0.count() * k}%-8d " +
        f"zorder=$tZ%6.2fs($nZ) bigramlm=$tLm%6.2fs($nLm) " +
        f"shards=$tSh%6.2fs($nSh) dsir=$tDs%6.2fs($nDs) " +
        f"bpe4=$tBpe%6.2fs($nBpe) audit=$tAud%6.2fs($nAud) " +
        f"cusum=$tCu%6.2fs($nCu) acf=$tPer%6.2fs($nPer) " +
        f"link=$tLink%6.2fs($nLink) fslink=$tFs%6.2fs($nFs)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
