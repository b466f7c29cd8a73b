package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PgProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(10).count()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    var t0 = System.nanoTime()
    val a = li.select(col("l_orderkey"), col("l_partkey").as("src"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("dst"))
    val edges = a.join(b, "l_orderkey").filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct().localCheckpoint()
    println(f"[pg] edges=${edges.count()} build=${(System.nanoTime()-t0)/1e9}%.2fs")
    t0 = System.nanoTime()
    val pr = graft.ops.PageRank.pageRank(edges, "src", "dst", 2)
    println(f"[pg] pr rows=${pr.count()} iterate=${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}
