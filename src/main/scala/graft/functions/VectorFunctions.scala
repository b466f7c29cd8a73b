package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity primitives over `array<float>` columns.
  *
  * Dot products / norms are expressed with the higher-order functions
  * `zip_with` + `aggregate` (codegen'd, no UDF): elements are folded in
  * array order in double precision, so results are bit-deterministic
  * regardless of partitioning — safe to oracle-check and safe to use as
  * sort keys at any cluster size.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Codegen'd cosine for array<float> columns via the native
    * FloatVecDot expression (same fold order — bit-identical to the
    * HOF form, minus the interpreted-lambda overhead). Requires
    * VecExpressions.register on the session. */
  def cosineNative(a: Column, b: Column): Column = {
    import VecExpressions.vecDot
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))
  }

  /** Pick the native path when the column is array<float>. */
  private def cosineFor(df: org.apache.spark.sql.DataFrame, vecCol: String)(a: Column, b: Column): Column = {
    val isFloat = df.schema.find(_.name == vecCol).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _)) => true
      case _ => false
    }
    if (isFloat) { VecExpressions.register(df.sparkSession); cosineNative(a, b) }
    else cosine(a, b)
  }

  /** Brute-force exact top-k cosine neighbours of each query vector.
    *
    * Plan shape: broadcast the (small) query set, nested-loop join
    * against the corpus — the corpus side streams through executors
    * partition-parallel with no shuffle; the only shuffle is the final
    * per-query top-k (rank window partitioned by query id). This is the
    * correct baseline at 100 TB: corpus-side scan scales linearly with
    * executors; k and |queries| bound the shuffle volume.
    *
    * Self-matches (same id) are excluded. Deterministic tiebreak on
    * (cosine desc, corpus id asc).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", cosineFor(corpus, vecCol)(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine_sim"))
  }

  /** IVF-style approximate top-k: assign corpus vectors to their nearest
    * centroid (coarse quantizer), then search only the `nprobe` closest
    * centroid buckets of each query.
    *
    * Scale path: centroid set stays driver-small and broadcast; the
    * corpus is scanned once to tag `centroid_id` (in practice this is a
    * write-time partition key so probes prune file scans); the join
    * `query-probe × bucket` replaces the full cross product — at 100 TB
    * with C centroids and nprobe p the scan cost drops by ~p/C.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val cent = centroids.select(col("centroid_id"), col("centroid_vec"))

    def nearestCentroids(df: DataFrame, vec: Column, outCol: String, take: Int): DataFrame = {
      val withC = df.join(broadcast(cent))
        .withColumn("__d", cosine(vec, col("centroid_vec")))
      val w = Window.partitionBy(col("__rowid")).orderBy(col("__d").desc, col("centroid_id").asc)
      withC.withColumn("__cr", row_number().over(w))
        .filter(col("__cr") <= take)
        .drop("__d", "__cr", "centroid_vec")
        .withColumnRenamed("centroid_id", outCol)
    }

    val taggedCorpus = nearestCentroids(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col(idCol).as("__rowid")),
      col("__cv"), "bucket", 1).drop("__rowid")
    val probes = nearestCentroids(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col(idCol).as("__rowid")),
      col("__qv"), "bucket", nprobe).drop("__rowid")

    val scored = taggedCorpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", cosineFor(corpus, vecCol)(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine_sim"))
  }

  /** DataFrame-native Lloyd's k-means for the IVF coarse quantizer.
    *
    * Deterministic init: the k corpus vectors with the smallest
    * xxhash64(id) (a seeded pseudo-random but reproducible draw). Each
    * iteration: broadcast the (tiny) centroid model, assign every
    * vector to its nearest centroid map-side, recompute centroids via
    * posexplode partial averages, collect the k×dim model back to the
    * driver — the classic scalable shape (model state driver-side like
    * MLlib, data never leaves executors except k×dim doubles).
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))

    def centroidDf(model: Seq[(Int, Seq[Double])]): DataFrame =
      model.toDF("centroid_id", "centroid_vec")

    // deterministic seed draw
    var model: Seq[(Int, Seq[Double])] = vecs
      .orderBy(xxhash64(col("id")))
      .limit(k).collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble) }.toSeq

    for (_ <- 1 to iters) {
      val cents = broadcast(centroidDf(model))
      val assigned = vecs.join(cents)
        .withColumn("__d", cosine(col("v"), col("centroid_vec")))
      val w = Window.partitionBy(col("id")).orderBy(col("__d").desc, col("centroid_id").asc)
      val best = assigned.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      model = best
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq
    }
    centroidDf(model)
  }

  /** Mean cosine distance of each vector to its assigned centroid —
    * the convergence metric for kmeansCentroids (1 - mean similarity,
    * non-increasing under Lloyd's iterations). */
  def assignmentInertia(corpus: DataFrame, centroids: DataFrame, vecCol: String): Double = {
    val assigned = corpus.select(col(vecCol).as("v"), monotonically_increasing_id().as("__rid"))
      .join(broadcast(centroids))
      .withColumn("__d", cosine(col("v"), col("centroid_vec")))
    val w = Window.partitionBy(col("__rid")).orderBy(col("__d").desc, col("centroid_id").asc)
    assigned.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .agg(avg(lit(1.0) - col("__d"))).head().getDouble(0)
  }

  /** Centroids for IVF without an iterative k-means fit: average the
    * vectors of each pre-existing label bucket. Computed via
    * posexplode → per-(label, dimension) partial avg — scales to any
    * corpus size (never collects whole vector lists per group); a
    * k-means refinement would slot in here with the same search path.
    */
  def centroidsByLabel(corpus: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    corpus
      .select(col(labelCol).as("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("centroid_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid_vec"))
  }
}
