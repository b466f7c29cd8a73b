package graft.tools

import org.apache.spark.sql.functions._

/** r17 opt-round probe: q137's sf1 bench showed the LabelProp rounds
  * re-exchanging (shuffle rows 54M -> 141M) after the one-pass capture
  * landed ([[graft.ops.ShuffleSizing.partitionedMaterializeCounted]]).
  * Isolate WHERE the recorded partitioning is lost by measuring the
  * shuffle rows of a downstream same-key aggregate over each capture
  * variant of the SAME BasketEdges-shaped relation:
  *
  *   A. two-pass (pre-r17): flat localCheckpoint, then
  *      partitionedMaterialize(checkpoint, s) — the known-good shape.
  *   B. one-pass (HEAD): partitionedMaterializeCounted(plan, s) — the
  *      repartition rides on the full upstream plan.
  *   C. one-pass over a trivial upstream (no join/distinct) — does
  *      plan complexity matter, or is the one-pass shape itself fine?
  *
  *   ./run_local.sh graft.tools.CapturePartProbe [sfDir]
  */
object CapturePartProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val mx = graft.bench.QueryMetricsListener.install(spark)
    def shufRows(df: org.apache.spark.sql.DataFrame): Long = {
      mx.reset(); df.count(); mx.read(spark).shuffleRows
    }
    def agg(src: org.apache.spark.sql.DataFrame) =
      src.groupBy(col("src")).agg(count(lit(1)).as("n"))

    // the LabelProp round-1 shape: labels from the capture, broadcast
    // into the edge join, two-level aggregate keyed on src
    def round1(parted: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val labels = parted.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
      parted.join(broadcast(labels.withColumnRenamed("id", "__nid")),
          col("dst") === col("__nid"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("n"))
        .groupBy(col("src"))
        .agg(max(struct(col("n"), (-col("label")).as("__neg"))).as("__m"))
        .select(col("src").as("id"), (-col("__m.__neg")).as("label"))
    }

    def edges() = graft.ops.BasketEdges.edges(
      graft.core.Tables.table(spark, dir, "lineitem"), "l_orderkey", "l_partkey")

    // A: two-pass
    {
      val flat = edges().localCheckpoint()
      val parted = graft.ops.ShuffleSizing.partitionedMaterialize(
        flat, col("src"), _.localCheckpoint())
      println(s"[cap] A two-pass: downstream agg shuffle rows = ${shufRows(agg(parted))}")
      println(s"[cap] A two-pass round1 shuffle rows = ${shufRows(round1(parted))}")
    }
    // B: one-pass over full plan
    {
      val (parted, n, _) = graft.ops.ShuffleSizing.partitionedMaterializeCounted(
        edges(), col("src"), _.localCheckpoint())
      println(s"[cap] B one-pass(full plan, n=$n): downstream agg shuffle rows = ${shufRows(agg(parted))}")
      println(s"[cap] B one-pass round1 shuffle rows = ${shufRows(round1(parted))}")
    }
    // C: one-pass over trivial upstream
    {
      import spark.implicits._
      val base = (1L to 100000L).map(i => (i % 997, i)).toDF("src", "dst")
      val (parted, n, _) = graft.ops.ShuffleSizing.partitionedMaterializeCounted(
        base, col("src"), _.localCheckpoint())
      println(s"[cap] C one-pass(trivial, n=$n): downstream agg shuffle rows = ${shufRows(agg(parted))}")
    }
    // D: the REAL labelPropagation call (q137 shape), per-materialization rows
    {
      var i = 0
      val mat: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
        mx.reset()
        val out = df.localCheckpoint()
        i += 1
        println(s"[cap] D real lpa materialize #$i shuffle rows = ${mx.read(spark).shuffleRows}")
        out
      }
      mx.reset()
      graft.ops.LabelProp.labelPropagation(edges(), "src", "dst",
        iterations = 3, assumeSymmetric = true, materialize = mat).count()
    }
    spark.stop()
  }
}
