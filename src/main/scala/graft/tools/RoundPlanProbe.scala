package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Print the EXECUTED plan of each per-round materialization inside
  * labelPropagation/pageRank — the loop bodies checkpoint eagerly, so
  * the final query's plan never shows where the per-round exchanges
  * happen. */
object RoundPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val which = if (args.isEmpty) "lpa" else args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var i = 0
    val mat: DataFrame => DataFrame = { df =>
      val out = df.localCheckpoint()
      i += 1
      val p = df.queryExecution.executedPlan.toString
      println(s"=== materialize #$i ===")
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("HashAggregate(keys") ||
        l.contains("AQEShuffleRead") || l.contains("LogicalRDD")).mkString("\n"))
      out
    }
    val edges = graft.ops.BasketEdges.edges(
      graft.core.Tables.table(spark, dir, "lineitem"), "l_orderkey", "l_partkey")
    if (which == "lpa")
      graft.ops.LabelProp.labelPropagation(edges, "src", "dst", iterations = 2,
        assumeSymmetric = true, materialize = mat).count()
    else
      graft.ops.PageRank.pageRank(edges, "src", "dst", iterations = 2,
        materialize = mat).count()
    spark.stop()
  }
}
