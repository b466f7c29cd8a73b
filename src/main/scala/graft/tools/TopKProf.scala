package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the TopKAgg claim: per-query top-k as a bounded typed
  * aggregate vs the row_number window it replaced, on the REAL scored
  * candidate stream of bruteForceTopK (broadcast queries × corpus).
  * Both forms run in one JVM, alternating, so they share cache/JIT
  * context; wall times are per-run with the first (cold) run separated.
  *
  *   ./run_local.sh graft.tools.TopKProf [sfDir] [nQueries] [k] [runs]
  *
  * The aggregate's win is exchange volume (≤ k rows/query/partition vs
  * every candidate) and the absent per-query sort; the probe also
  * prints the candidate count so the shuffle delta is explicit. */
object TopKProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(512)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)

    val emb = graft.core.Tables.table(spark, sfDir, "embeddings")
    val queries = emb.orderBy(md5(col("vec_id").cast("string"))).limit(nQueries)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"))
    graft.functions.VecExpressions.register(spark)
    def scored: DataFrame = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        graft.functions.VectorFunctions.cosineNative(col("__qv"), col("__cv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"))

    def windowForm: DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
    def aggForm: DataFrame =
      scored.groupBy(col("query_id"))
        .agg(graft.functions.TopKAgg.topk(k)(col("cosine_sim"), col("neighbor_id")).as("__tk"))
        .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__e")))

    val nCand = scored.count()
    System.err.println(s"[topkprof] sf=$sfDir queries=$nQueries k=$k candidates=$nCand")
    def time(name: String, df: => DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.gc(); (n, dt)
      }
      val warm = ts.drop(1).map(_._2).sorted
      val med = if (warm.isEmpty) ts.head._2 else warm(warm.size / 2)
      System.err.println(f"[topkprof] $name%-8s rows=${ts.head._1} cold=${ts.head._2}%.2fs " +
        f"warm=${ts.drop(1).map(t => f"${t._2}%.2f").mkString("/")} med=$med%.2fs")
    }
    // alternate so neither form owns the cache advantage
    time("window", windowForm)
    time("agg", aggForm)
    time("window", windowForm)
    time("agg", aggForm)
    spark.stop()
  }
}
