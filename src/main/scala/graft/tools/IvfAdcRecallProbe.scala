package graft.tools

import org.apache.spark.sql.functions._

/** IVFADC quality ladder (the q30 recall-ladder precedent applied to
  * the composed index), extended in r14 with the residual-encoded
  * variant: at every nprobe the raw-vector and residual (Jégou §IV)
  * searches run on the SAME code budget (m×subDim×k), and recall@10 is
  * measured against two truths —
  *   - the exhaustive raw ADC (isolates the coarse stage's pruning
  *     loss from quantization loss, the original ladder), and
  *   - the EXACT L2 top-10 over the uncompressed vectors (the truth a
  *     user cares about: both quantizations compete on it, so the
  *     residual-vs-raw delta at fixed budget is read off this column).
  * Warm wall times ride along. */
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
    val means = graft.functions.VectorFunctions.centroidMeansE6(
      emb, "label", "embedding")
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

    // exact L2 truth over uncompressed vectors: d = |c|^2 - 2 c.q
    // (|q|^2 constant per query), kernel dot products, top-10 window
    graft.functions.VecExpressions.register(spark)
    val exact = {
      import graft.functions.VecExpressions.vecDot
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        .withColumn("cc", vecDot(col("cv"), col("cv")))
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("d").asc, col("neighbor_id").asc)
      c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("d", col("cc") - lit(2.0) * vecDot(col("cv"), col("qv")))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
    }
    val truthExact = pairs(exact)

    val codes = graft.functions.ProductQuantizer.encode(
      emb, "vec_id", "embedding", model).localCheckpoint()
    val (truthAdc, tEx) = timed(pairs(graft.functions.ProductQuantizer.adcTopK(
      queries, codes, model, "vec_id", "embedding", 10)))
    def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]) =
      got.intersect(truth).size.toDouble / truth.size
    println(f"[ivfadc] corpus ${emb.count()} vecs, $nCells cells, $nQueries queries, " +
      f"code budget m=4 subDim=16 k=8")
    println(f"[ivfadc] exhaustive raw ADC ${tEx}%6.2f s  " +
      f"recall-vs-exact ${recall(truthAdc, truthExact)}%.3f  (${truthAdc.size} pairs)")
    for (np <- Seq(1, 2, 4, 8).filter(_ < nCells) :+ nCells) {
      val (raw, tRaw) = timed(pairs(graft.functions.ProductQuantizer.ivfAdcTopK(
        queries, emb, centroids, model, "vec_id", "embedding", 10, np)))
      val (res, tRes) = timed(pairs(graft.functions.ProductQuantizer.ivfAdcResidualTopK(
        queries, emb, centroids, means, m = 4, subDim = 16, kCode = 8, iters = 2,
        "vec_id", "embedding", 10, np)))
      println(f"[ivfadc] nprobe=$np%-2d raw      ${tRaw}%6.2f s  " +
        f"recall-vs-adc ${recall(raw, truthAdc)}%.3f  recall-vs-exact ${recall(raw, truthExact)}%.3f")
      println(f"[ivfadc] nprobe=$np%-2d residual ${tRes}%6.2f s  " +
        f"                        recall-vs-exact ${recall(res, truthExact)}%.3f")
    }
    spark.stop()
  }
}
