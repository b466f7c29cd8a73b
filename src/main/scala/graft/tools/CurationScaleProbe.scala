package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the round-5 curation operators: emulate 3×/10× the
  * sf0.1 documents/embeddings tables by unioning id-shifted copies
  * (texts repeat, ids don't — dup/boilerplate structure repeats per
  * copy like a sharded real corpus) and time each operator. Expected
  * shapes, asserted by eye against PLANS.md claims:
  *   - sourceStats, trainingOrder, budgetSelect: scan/shuffle-bound,
  *     ~linear;
  *   - crossMinhashMatches: corpus-side linear (bench fixed+broadcast);
  *   - dropBoilerplateLines: two corpus passes, ~linear;
  *   - kmeans fit+assign: iterations × corpus scans, ~linear.
  */
object CurationScaleProbe {
  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", 1000)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"

    def copies(base: DataFrame, k: Int, idCol: String): DataFrame =
      (0 until k).map(i => base.withColumn(idCol, col(idCol) + lit(i * Stride)))
        .reduce(_ unionByName _)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    val docs0 = graft.core.Tables.table(spark, dir, "documents")
    val emb0 = graft.core.Tables.table(spark, dir, "embeddings")
    // measured, not assumed — the tool accepts any dataset dir
    val (nDocs0, nVecs0) = (docs0.count(), emb0.count())

    for (k <- Seq(1, 3, 10)) {
      println(s"\n===== k=$k (docs=${nDocs0 * k}, vecs=${nVecs0 * k}) =====")
      val docs = copies(docs0, k, "doc_id").localCheckpoint(true)
      val emb = copies(emb0, k, "vec_id").localCheckpoint(true)

      time(s"sourceStats x$k") {
        graft.ops.TextProfile.sourceStats(docs, "text", "source").count()
      }
      time(s"crossMinhash x$k") {
        graft.ops.Dedup.crossMinhashMatches(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs0.filter(col("doc_id") % 10 === 0), // bench FIXED while corpus grows
          "doc_id", "text", threshold = 0.35, k = 32).count()
      }
      time(s"boilerplateLines x$k") {
        graft.ops.Dedup.dropBoilerplateLines(
          docs.withColumn("text", concat(lit("HEADER\n"), col("text"),
            lit("\nFOOTER"))), "doc_id", "text", minDocs = 50).count()
      }
      time(s"boilerplateWorstCase x$k") {
        // adversarial: every synthetic line repeats in exactly minDocs
        // docs (div keeps copies distinct so the boiler set grows with
        // the corpus: 20 × docs/5 lines = corpus_lines/minDocs). With
        // broadcast disabled the anti-join degrades to the shuffle join
        // the scaladoc worst-case bound describes — and must behave.
        val adv = docs.withColumn("text",
          concat_ws("\n", (0 until 20).map(j =>
            concat(lit(s"B$j-"), (col("doc_id") / 5).cast("long").cast("string"))): _*))
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        try graft.ops.Dedup.dropBoilerplateLines(adv, "doc_id", "text", minDocs = 5).count()
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
      time(s"budgetSelect x$k") {
        graft.ops.Sampling.budgetSelect(
          docs.select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "doc_id", "n_chars", 8000L, Some("n_chars")).count()
      }
      time(s"trainingOrder x$k") {
        graft.ops.Sampling.trainingOrder(
          docs.select(col("doc_id")), "doc_id", shards = 32).count()
      }
      time(s"kmeans fit+assign x$k") {
        val c = graft.functions.VectorFunctions.kmeansCentroids(
          emb, "vec_id", "embedding", k = 8, iters = 2)
        graft.functions.VectorFunctions.assignBuckets(
          emb, col("embedding"), c, "cluster").count()
      }
      time(s"bloomContamination x$k") {
        // bench fixed while the corpus grows: probe cost must track the
        // corpus-side gram volume, never the filter build
        graft.ops.Decontaminate.bloomContamination(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs0.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 5, mBits = 1 << 18, kHashes = 3).count()
      }
      time(s"hllDistinct x$k") {
        graft.ops.Sketches.hllDistinct(docs, Seq("lang"),
          col("doc_id") % 100000, p = 8).count()
      }
      time(s"pagerank(2) x$k") {
        // doc-similarity-shaped graph: synthetic bounded-degree edges
        // over the grown id space (each id links to 8 neighbours)
        val ids = docs.select(col("doc_id").as("src"))
        val edges = ids.select(col("src"), explode(array((1 to 8).map(lit(_)): _*)).as("__o"))
          .select(col("src"), ((col("src") + col("__o") * 97) % (nDocs0 * k)).as("dst"))
          .filter(col("src") =!= col("dst"))
        graft.ops.PageRank.pageRank(edges, "src", "dst", iterations = 2).count()
      }
    }
    spark.stop()
  }
}
