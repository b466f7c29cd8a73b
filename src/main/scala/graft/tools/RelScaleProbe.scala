package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-layer twin of [[ScaleProbe]]: emulate sf0.3/sf1 from the
  * sf0.1 tables by unioning k key-shifted copies (order/cust/supp keys
  * shifted per copy so each copy joins only within itself — join
  * fan-out and group counts grow exactly like a real larger SF; nation/
  * region stay fixed, as in genuine TPC-H). Times the q01/q03/q05
  * shapes plus the q44 dup-components pipeline, and reports which join
  * strategy AQE picked for q03's lineitem⋈orders join — PLANS.md
  * predicts the broadcast flips to SortMergeJoin once the filtered
  * orders side outgrows the broadcast threshold. */
object RelScaleProbe {
  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", 1000)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"

    def copies(base: DataFrame, k: Int, shift: Map[String, Long]): DataFrame =
      (0 until k).map { i =>
        shift.foldLeft(base) { case (df, (c, mult)) =>
          df.withColumn(c, col(c) + lit(i * mult * Stride))
        }
      }.reduce(_ unionByName _)

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }

    val li0 = graft.core.Tables.table(spark, dir, "lineitem")
    val ord0 = graft.core.Tables.table(spark, dir, "orders")
    val cust0 = graft.core.Tables.table(spark, dir, "customer")
    val supp0 = graft.core.Tables.table(spark, dir, "supplier")
    val nat = graft.core.Tables.table(spark, dir, "nation")
    val reg = graft.core.Tables.table(spark, dir, "region")
    val docs0 = graft.core.Tables.table(spark, dir, "documents")

    for (k <- Seq(1, 3, 10)) {
      val li = copies(li0, k, Map("l_orderkey" -> 1L, "l_suppkey" -> 1L))
        .localCheckpoint(true)
      val ord = copies(ord0, k, Map("o_orderkey" -> 1L, "o_custkey" -> 1L))
        .localCheckpoint(true)
      val cust = copies(cust0, k, Map("c_custkey" -> 1L)).localCheckpoint(true)
      val supp = copies(supp0, k, Map("s_suppkey" -> 1L)).localCheckpoint(true)

      val dsum = (c: org.apache.spark.sql.Column) =>
        sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double")

      val (t01, _) = time {
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
          .count()
      }

      val q03 = li.filter(col("l_shipdate") > lit("1996-07-01").cast("timestamp"))
        .join(ord.filter(col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust.filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
      val (t03, _) = time(q03.collect())
      // AQE's final choice for the unhinted lineitem⋈orders join
      val plan = q03.queryExecution.executedPlan.toString
      val joinKind =
        if (plan.contains("SortMergeJoin")) "SMJ"
        else if (plan.contains("ShuffledHashJoin")) "SHJ"
        else "BHJ-only"

      val (t05, _) = time {
        li.join(ord.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .count()
      }

      // q44 pipeline on k× perturbed docs (disjoint shingle spaces, as
      // in ScaleProbe — pair/component structure grows k×)
      val docs = (0 until k).map { i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i * Stride))
          .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1_c" + i))
      }.reduce(_ unionByName _).localCheckpoint(true)
      val (t44, n44) = time {
        graft.ops.Dedup.connectedComponents(
          graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 6, 10, 1000)).count()
      }
      // at the top k, force the DISTRIBUTED pointer-jumping path too
      // (driverMaxEdges=0) so the 100 TB codepath has a measured number,
      // not just a spec
      val (tDist, nDist) =
        if (k == 10) time {
          graft.ops.Dedup.connectedComponents(
            graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 6, 10, 1000),
            driverMaxEdges = 0).count()
        } else (0.0, 0L)

      println(f"[relscale] k=$k%-2d (~sf${k / 10.0}%.1f) q01=$t01%6.2fs " +
        f"q03=$t03%6.2fs(li⋈ord=$joinKind) q05=$t05%6.2fs q44=$t44%6.2fs($n44)" +
        (if (k == 10) f" q44dist=$tDist%6.2fs($nDist)" else ""))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
