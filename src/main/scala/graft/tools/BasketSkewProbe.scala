package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the mega-basket skew bound of BasketEdges (PLANS.md r8):
  * sf lineitem baskets plus ONE synthetic hot order with `hotK` items —
  * the wholesale-order / bot-session shape that a 100 TB corpus will
  * contain — timed uncapped vs capped. Uncapped, the hot basket alone
  * emits hotK·(hotK-1) pairs into one shuffle partition; capped, its
  * contribution is bounded by cap².
  *
  * Usage: runMain graft.tools.BasketSkewProbe [sfDir] [hotK] [cap]
  * (defaults /root/testdata/sf0.1, 2000, 100)
  */
object BasketSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val hotK = if (args.length > 1) args(1).toInt else 2000
    val cap = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)

    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
    // one hot basket, key far outside the real orderkey range
    val hot = spark.range(hotK)
      .select(lit(Long.MaxValue).as("basket"), (col("id") + 1).as("item"))
    val baskets = li.union(hot).localCheckpoint(true) // isolate input build

    def time(name: String, in: org.apache.spark.sql.DataFrame, maxBasketSize: Int): Unit = {
      val t0 = System.nanoTime()
      val n = graft.ops.BasketEdges.edges(in, "basket", "item", maxBasketSize).count()
      println(f"[basket-skew] $name%-22s edges=$n%12d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("sf_only_uncapped", li, 0)
    time(s"hot${hotK}_uncapped", baskets, 0)
    time(s"hot${hotK}_cap$cap", baskets, cap)
    spark.stop()
  }
}
