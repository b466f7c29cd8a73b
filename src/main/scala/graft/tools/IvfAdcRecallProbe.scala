package graft.tools

import org.apache.spark.sql.functions._

/** IVFADC quality ladder (the q30 recall-ladder precedent applied to
  * the composed index): recall@10 of `ivfAdcTopK` vs the exhaustive
  * `adcTopK` at nprobe 1/2/4/8 over the fixture embeddings, plus warm
  * wall times — the measured answer to "what does bucket pruning cost
  * in answer quality at each probe depth". Recall is against the
  * EXHAUSTIVE ADC (same quantization), so the ladder isolates the
  * coarse stage's pruning loss from PQ quantization loss. */
object IvfAdcRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/tmp/gensf1"
    val emb = graft.core.Tables.table(spark, dir, "embeddings").localCheckpoint()
    val nQueries = 50
    val model = graft.functions.ProductQuantizer.train(
      emb, "vec_id", "embedding", m = 4, subDim = 16, k = 8, iters = 2)
    val centroids = graft.functions.VectorFunctions.centroidsByLabel(
      emb, "label", "embedding").localCheckpoint()
    val nCells = centroids.count().toInt
    val queries = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nQueries).localCheckpoint()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed(f: => Set[(Long, Long)]): (Set[(Long, Long)], Double) = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val codes = graft.functions.ProductQuantizer.encode(
      emb, "vec_id", "embedding", model).localCheckpoint()
    val (truth, tEx) = timed(pairs(graft.functions.ProductQuantizer.adcTopK(
      queries, codes, model, "vec_id", "embedding", 10)))
    println(f"[ivfadc] corpus ${emb.count()} vecs, $nCells cells, $nQueries queries")
    println(f"[ivfadc] exhaustive ADC     ${tEx}%6.2f s  (ground truth, ${truth.size} pairs)")
    for (np <- Seq(1, 2, 4, 8).filter(_ <= nCells) :+ nCells) {
      val (got, t) = timed(pairs(graft.functions.ProductQuantizer.ivfAdcTopK(
        queries, emb, centroids, model, "vec_id", "embedding", 10, np)))
      val recall = got.intersect(truth).size.toDouble / truth.size
      println(f"[ivfadc] nprobe=$np%-2d           ${t}%6.2f s  recall@10 ${recall}%.3f")
    }
    spark.stop()
  }
}
