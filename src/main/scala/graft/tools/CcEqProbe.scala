package graft.tools

import org.apache.spark.sql.functions._

/** Equality probe for [[graft.ops.Dedup.connectedComponents]]'s three
  * plan variants at graph scale (r16): the exchange-free
  * localCheckpoint path, the reliable parquet-cut path, and the
  * default symmetrize path must assign IDENTICAL components — the
  * recipe is a plan choice, never a result change. Signature =
  * (row count, sum of row hashes): order-free, collect-free.
  *
  *   ./run_local.sh graft.tools.CcEqProbe [sfDir]
  */
object CcEqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/gensf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.ops.BasketEdges.edges(
        graft.core.Tables.table(spark, dir, "lineitem"), "l_orderkey", "l_partkey")
      .select(col("src").as("id_a"), col("dst").as("id_b"))
    def sig(df: org.apache.spark.sql.DataFrame): String =
      df.agg(count(lit(1)).as("n"), // bit_xor: order-free, overflow-free
        expr("bit_xor(xxhash64(doc_id, component_id))").as("h")).head.toString
    val a = sig(graft.ops.Dedup.connectedComponents(edges, assumeSymmetric = true))
    val b = sig(graft.ops.Dedup.connectedComponents(edges, assumeSymmetric = true,
      checkpointDir = Some(java.nio.file.Files.createTempDirectory("cceq").toString + "/run")))
    val c = sig(graft.ops.Dedup.connectedComponents(edges))
    println(s"[cceq] exchange-free=$a parquet-cut=$b default-symmetrize=$c " +
      s"EQUAL=${a == b && b == c}")
    spark.stop()
    if (!(a == b && b == c)) sys.exit(1)
  }
}
