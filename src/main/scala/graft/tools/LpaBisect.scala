package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bisect WHERE the real labelPropagation loses the capture's
  * partitioning (CapturePartProbe: inline round-1 replica is
  * exchange-free, the real call re-exchanges every round).
  * Variants flip one suspect at a time.
  *
  *   ./run_local.sh graft.tools.LpaBisect [sfDir]
  */
object LpaBisect {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mx = graft.bench.QueryMetricsListener.install(spark)

    def edges() = graft.ops.BasketEdges.edges(
      graft.core.Tables.table(spark, dir, "lineitem"), "l_orderkey", "l_partkey")

    def rounds(parted: DataFrame, iterations: Int, doCount: Boolean,
               tag: String): DataFrame = {
      var labels = parted.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
      val smallV = !doCount || labels.count() <= graft.ops.ShuffleSizing.BroadcastNodeLimit
      def labelSide(df: DataFrame): DataFrame = if (smallV) broadcast(df) else df
      for (r <- 1 to iterations) {
        mx.reset()
        labels =
          parted.join(labelSide(labels.withColumnRenamed("id", "__nid")),
              col("dst") === col("__nid"))
            .groupBy(col("src"), col("label")).agg(count(lit(1)).as("n"))
            .groupBy(col("src"))
            .agg(max(struct(col("n"), (-col("label")).as("__neg"))).as("__m"))
            .select(col("src").as("id"), (-col("__m.__neg")).as("label"))
            .localCheckpoint()
        println(s"[bisect] $tag round $r shuffle rows = ${mx.read(spark).shuffleRows}")
      }
      labels
    }

    def capture(): DataFrame = {
      val dir0 = edges().select(col("src").as("src"), col("dst").as("dst"))
      val (parted, n, _) = graft.ops.ShuffleSizing.partitionedMaterializeCounted(
        dir0, col("src"), _.localCheckpoint())
      println(s"[bisect] capture n=$n")
      parted
    }

    // E0: capture WITHOUT the no-op select; round-1 executed via count
    // (the CapturePartProbe conditions) AND via localCheckpoint
    {
      val (parted, n, _) = graft.ops.ShuffleSizing.partitionedMaterializeCounted(
        edges(), col("src"), _.localCheckpoint())
      def round1(p: DataFrame): DataFrame = {
        val labels = p.select(col("src").as("id")).distinct()
          .withColumn("label", col("id"))
        p.join(broadcast(labels.withColumnRenamed("id", "__nid")),
            col("dst") === col("__nid"))
          .groupBy(col("src"), col("label")).agg(count(lit(1)).as("n"))
          .groupBy(col("src"))
          .agg(max(struct(col("n"), (-col("label")).as("__neg"))).as("__m"))
          .select(col("src").as("id"), (-col("__m.__neg")).as("label"))
      }
      mx.reset(); round1(parted).count()
      println(s"[bisect] E0 count-exec round1 rows = ${mx.read(spark).shuffleRows}")
      mx.reset(); val ck = round1(parted).localCheckpoint()
      println(s"[bisect] E0 ckpt-exec round1 rows = ${mx.read(spark).shuffleRows}")
      println("[bisect] E0 parted optimizedPlan leaf:")
      parted.queryExecution.optimizedPlan.collectLeaves().foreach(l => println("   " + l.getClass.getSimpleName + " " + l))
    }
    // E1: inline body, no scoped, no smallV count, 3 rounds
    rounds(capture(), 3, doCount = false, "E1 no-scoped no-count")
    // E2: inline body, no scoped, WITH smallV count
    rounds(capture(), 3, doCount = true, "E2 no-scoped count")
    // E3: inline body inside CacheHygiene.scoped, with count
    graft.ops.CacheHygiene.scoped(spark) {
      rounds(capture(), 3, doCount = true, "E3 scoped count")
    }(_.localCheckpoint())
    spark.stop()
  }
}
