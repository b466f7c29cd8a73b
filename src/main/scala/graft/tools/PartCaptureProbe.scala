package graft.tools

import org.apache.spark.sql.functions._

/** Probe (r16): can a COLUMNAR cache replace the localCheckpoint in
  * [[graft.ops.ShuffleSizing.partitionedMaterialize]]? The checkpoint
  * capture works (downstream aggregates plan no exchange) but its
  * blocks scan as row-format deserialization — the sf10 CC dissection
  * measured ~17 s per 240M-row round scan vs ~7 s for the same rows
  * through vectorized parquet. An InMemoryRelation scans columnar,
  * but r15's probe found a cached repartition does NOT surface its
  * partitioning; this probe isolates WHICH conditions (AQE on/off at
  * cache build, `canChangeCachedPlanOutputPartitioning`) change that,
  * by counting exchanges in a downstream same-key aggregate.
  *
  *   ./run_local.sh graft.tools.PartCaptureProbe
  */
object PartCaptureProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = (1L to 100000L).map(i => (i % 997, i)).toDF("s", "t")

    // measured shuffle rows, not plan text: an InMemoryRelation PRINTS
    // its stored child plan (including the repartition's exchange), so
    // plan-string counting can't tell a surfaced partitioning from a
    // re-shuffle — executed rows can (0 = aggregate ran exchange-free)
    val mx = graft.bench.QueryMetricsListener.install(spark)
    def exchanges(df: org.apache.spark.sql.DataFrame): Long = {
      mx.reset()
      df.count()
      mx.read(spark).shuffleRows
    }
    def agg(src: org.apache.spark.sql.DataFrame) =
      src.groupBy(col("s")).agg(count(lit(1)).as("n"))

    for (changeCached <- Seq("true", "false"); aqeAtBuild <- Seq("true", "false")) {
      spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", changeCached)
      val k = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, aqeAtBuild)
      val cached = base.repartition(col("s")).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.count() // materialize under the build-time conf
      spark.conf.set(k, prev)
      val n = exchanges(agg(cached))
      println(s"[partprobe] cache: canChange=$changeCached aqeAtBuild=$aqeAtBuild " +
        s"downstreamShuffleRows=$n (0 = partitioning surfaced)")
      cached.unpersist(true)
    }
    // control: the checkpoint capture (known to surface with AQE off)
    val ck = graft.ops.ShuffleSizing.partitionedMaterialize(
      base, col("s"), _.localCheckpoint())
    println(s"[partprobe] checkpoint control: downstreamShuffleRows=${exchanges(agg(ck))}")

    // Part 2 (optional: pass <sfDir>): the REAL graph-round shape at
    // basket-graph scale — capture the edge relation once per storage
    // variant, run 4 rounds of broadcast-label join + groupBy(s) min,
    // and compare wall + shuffle rows. This is the measurement that
    // decides whether the graph family's capture should store columnar
    // (cache) instead of row blocks (localCheckpoint): the sf10 CC
    // dissection put ~17 s/round on the checkpoint block scan vs ~7 s
    // for the same rows through a vectorized scan.
    args.headOption.foreach { dir =>
      val edges = graft.ops.BasketEdges.edges(
          graft.core.Tables.table(spark, dir, "lineitem"), "l_orderkey", "l_partkey")
        .select(col("src").as("s"), col("dst").as("t"))
      val edgeRows = { val c = edges.persist(); val n = c.count(); n }
      println(s"[partprobe] graph shape: $edgeRows edges")
      def rounds(parted: org.apache.spark.sql.DataFrame, label: String): Unit = {
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        var labels = parted.select(col("s").as("v")).distinct()
          .withColumn("comp", col("v")).localCheckpoint()
        mx.reset()
        val t0 = System.nanoTime()
        for (_ <- 1 to 4) {
          labels = parted.join(
              broadcast(labels.withColumnRenamed("v", "t").withColumnRenamed("comp", "nc")),
              Seq("t"))
            .groupBy(col("s").as("v")).agg(min(col("nc")).as("comp"))
            .localCheckpoint()
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val m = mx.read(spark)
        println(f"[partprobe] rounds($label%-18s) ${dt}%7.2f s shuffleRows=${m.shuffleRows}")
        // release only what THIS run registered (per-round label cuts) —
        // the captures under measure must survive across legs
        (spark.sparkContext.getPersistentRDDs.keySet.toSet -- before)
          .foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
            .foreach(_.unpersist(false)))
      }
      graft.ops.ShuffleSizing.withEdgeScaledShuffle(spark, edgeRows) {
        val viaCkpt = graft.ops.ShuffleSizing.partitionedMaterialize(
          edges, col("s"), _.localCheckpoint())
        rounds(viaCkpt, "localCheckpoint")
        val viaCache = {
          val k = "spark.sql.adaptive.enabled"
          val prev = spark.conf.get(k)
          spark.conf.set(k, "false")
          try {
            val c = edges.repartition(col("s")).persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            c.count(); c
          } finally spark.conf.set(k, prev)
        }
        rounds(viaCache, "columnar cache")
        rounds(viaCache, "columnar cache(2)") // warm re-read
      }
    }
    spark.stop()
  }
}
