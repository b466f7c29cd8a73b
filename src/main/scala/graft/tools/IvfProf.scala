package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing of the q187 IVFADC pipeline — the sf10-drill
  * diagnosis harness (q187 34 s vs exhaustive q170 5.5 s at sf10). */
object IvfProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/tmp/gensf10"
    val emb = graft.core.Tables.table(spark, dir, "embeddings").localCheckpoint()
    import graft.functions.{ProductQuantizer, VectorFunctions => VF}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val model = time("train")(ProductQuantizer.train(emb, "vec_id", "embedding", 4, 16, 8, 2))
    val centroids = time("centroidsByLabel.count")(
      { val c = VF.centroidsByLabel(emb, "label", "embedding"); c.count(); c })
    val queries = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(10)
    time("queries.count (takeOrdered)")(queries.count())
    time("queries.count again")(queries.count())
    val cm = graft.functions.VectorFunctions.collectCentroids(centroids)
    time("collectCentroids again")(graft.functions.VectorFunctions.collectCentroids(centroids))
    graft.functions.VecExpressions.register(spark)
    val bare = emb.select(graft.functions.VecExpressions.vecDot(
      col("embedding"), graft.functions.VecExpressions.litVec(cm.head._2)).as("d"))
    time("bare 1-centroid dot scan")(bare.agg(sum(col("d"))).head())
    time("bare 1-centroid dot again")(bare.agg(sum(col("d"))).head())
    val allDots = emb.select(cm.map { case (id, cv) =>
      graft.functions.VecExpressions.vecDot(col("embedding"),
        graft.functions.VecExpressions.litVec(cv)).as(s"d$id") }: _*)
    time("bare 10-centroid dot scan")(
      allDots.agg(sum(col("d0"))).head())
    time("assignBuckets limit100")(
      graft.functions.VectorFunctions.assignBuckets(
        emb.limit(100).select(col("vec_id"), col("embedding")),
        col("embedding"), centroids, "__b").count())
    time("assignBuckets.count")(
      VF.assignBuckets(emb.select(col("vec_id"), col("embedding")),
        col("embedding"), centroids, "__b").count())
    time("assignBuckets.count again")(
      VF.assignBuckets(emb.select(col("vec_id"), col("embedding")),
        col("embedding"), centroids, "__b").count())
    time("assignProbes(queries).count")(
      VF.assignProbes(queries.select(col("vec_id").as("query_id"), col("embedding").as("__v")),
        col("__v"), centroids, "bucket", 3).count())
    time("encode.count")(
      ProductQuantizer.encode(emb, "vec_id", "embedding", model).count())
    time("ivfAdcTopK full")(
      ProductQuantizer.ivfAdcTopK(queries, emb, centroids, model,
        "vec_id", "embedding", 10, 3).count())
    time("ivfAdcTopK full again")(
      ProductQuantizer.ivfAdcTopK(queries, emb, centroids, model,
        "vec_id", "embedding", 10, 3).count())
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    time("adcTopK exhaustive")(
      ProductQuantizer.adcTopK(queries, codes, model, "vec_id", "embedding", 10).count())
    time("adcTopK exhaustive again")(
      ProductQuantizer.adcTopK(queries, codes, model, "vec_id", "embedding", 10).count())
    // ---- ADC stage dissection (replicates adcTopK's internals) ----
    val subDim = 16
    val qsub = queries.select(col("vec_id").as("query_id"),
        explode(array((0 until 4).map(s => struct(lit(s).as("s"),
          transform(slice(col("embedding"), s * subDim + 1, subDim),
            x => floor(x.cast("double") * lit(1000000.0)).cast("long")).as("qv"))): _*)).as("e"))
      .select(col("query_id"), col("e.s").as("s"), col("e.qv").as("qv"))
    val lut = qsub.join(ProductQuantizer.codebookDf(spark, model), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        aggregate(zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v).as("__d"))
    time("lut build+collect")(lut.count())
    val joined = codes.join(broadcast(lut),
      codes("subspace") === lut("s") && codes("code") === lut("code") &&
        codes("id") =!= lut("query_id"))
    time("join only (count)")(joined.count())
    val agg = joined.select(col("query_id"), codes("id").as("neighbor_id"), col("__d"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(sum(col("__d")).as("adc_dist"))
    time("join+agg (count)")(agg.count())
    time("join+agg+window")(agg.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(col("adc_dist").asc, col("neighbor_id").asc)))
      .filter(col("rank") <= 10).count())
    // ---- realistic cell count: kmeans C=64 coarse quantizer ----
    // the fixture's 10 label cells cap pruning at nprobe/10; a real
    // index sizes C ~ sqrt(n) so the probed fraction actually shrinks
    val km = time("kmeans C=64 train (build)")(
      { val c = VF.kmeansCentroids(emb, "vec_id", "embedding", k = 64, iters = 2)
        c.count(); c.localCheckpoint() })
    for (np <- Seq(4, 8)) {
      time(s"ivfAdcTopK C=64 nprobe=$np")(
        ProductQuantizer.ivfAdcTopK(queries, emb, km, model,
          "vec_id", "embedding", 10, np).count())
      time(s"ivfAdcTopK C=64 nprobe=$np again")(
        ProductQuantizer.ivfAdcTopK(queries, emb, km, model,
          "vec_id", "embedding", 10, np).count())
    }
    spark.stop()
  }
}
