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
