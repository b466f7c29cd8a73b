package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B timing of BasketEdges formulations plus a per-phase dissection
  * of the q205 graph-family composite (capture / LP / PR / BFS). */
object EdgeProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def reset(): Unit = {
      graft.ops.CacheHygiene.quietRelease {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      System.gc()
    }
    def time(label: String)(body: => Unit): Unit = {
      body; reset() // warm
      val t0 = System.nanoTime(); body
      println(f"[edgeprof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      reset()
    }

    val li = graft.core.Tables.table(spark, dir, "lineitem")
    val items = li.select(col("l_orderkey").as("__b"), col("l_partkey").as("__i"))

    // A: current — plain self-join + distinct
    val a = items.join(items.withColumnRenamed("__i", "__j"), "__b")
      .filter(col("__i") =!= col("__j"))
      .select(col("__i").as("src"), col("__j").as("dst")).distinct()
    time("A self-join (current)") { noop(a) }
    println(s"[edgeprof] edges = ${a.count()}"); reset()

    // B: spread items first
    val itemsSpread = graft.ops.Dedup.ensureParallelism(items)
    val b = itemsSpread.join(itemsSpread.withColumnRenamed("__i", "__j"), "__b")
      .filter(col("__i") =!= col("__j"))
      .select(col("__i").as("src"), col("__j").as("dst")).distinct()
    time("B spread self-join") { noop(b) }

    // C: groupBy collect_list + explode pairs
    val grouped = items.groupBy(col("__b")).agg(collect_list(col("__i")).as("is"))
    val c = grouped.select(explode(col("is")).as("__i"), col("is"))
      .select(col("__i"), explode(col("is")).as("__j"))
      .filter(col("__i") =!= col("__j"))
      .select(col("__i").as("src"), col("__j").as("dst")).distinct()
    time("C groupBy+explode") { noop(c) }

    // D: repartition by __b then self-join (co-partitioned, no broadcast)
    val byB = items.repartition(col("__b"))
    val d = byB.join(byB.withColumnRenamed("__i", "__j"), "__b")
      .filter(col("__i") =!= col("__j"))
      .select(col("__i").as("src"), col("__j").as("dst")).distinct()
    time("D repart-by-b self-join") { noop(d) }

    // phase dissection of q205's composite — run twice, second is warm
    for (round <- 1 to 2) {
    println(s"[edgeprof] --- q205 phases round $round ---")
    val t0 = System.nanoTime()
    val edges = graft.ops.BasketEdges.edges(li, "l_orderkey", "l_partkey")
    val g = graft.ops.GraphCapture.capture(edges, "src", "dst", symmetrize = false)
    val t1 = System.nanoTime()
    println(f"[edgeprof] q205 capture phase              ${(t1 - t0) / 1e9}%7.2f s (|E|=${g.edgeCount})")
    val lp = graft.ops.LabelProp.labelPropagation(g, iterations = 3)
    noop(lp)
    val t2 = System.nanoTime()
    println(f"[edgeprof] q205 labelprop phase            ${(t2 - t1) / 1e9}%7.2f s")
    val pr = graft.ops.PageRank.pageRank(g, iterations = 2)
    noop(pr)
    val t3 = System.nanoTime()
    println(f"[edgeprof] q205 pagerank phase             ${(t3 - t2) / 1e9}%7.2f s")
    val sources = graft.core.Tables.table(spark, dir, "part")
      .filter(col("p_partkey") % 50 === 0).select(col("p_partkey"))
    val aqeOff = sys.env.get("GRAFT_EDGEPROF_BFS_AQE_OFF").contains("1")
    if (aqeOff) spark.conf.set("spark.sql.adaptive.enabled", "false")
    val bf = graft.ops.Bfs.hopDistance(g, sources, maxHops = 3)
    noop(bf)
    if (aqeOff) spark.conf.set("spark.sql.adaptive.enabled", "true")
    val t4 = System.nanoTime()
    println(f"[edgeprof] q205 bfs phase                  ${(t4 - t3) / 1e9}%7.2f s (aqeOff=$aqeOff)")
    g.release()
    val joined = lp.withColumnRenamed("id", "part")
      .join(pr.withColumnRenamed("id", "part"), "part")
      .join(bf.withColumnRenamed("id", "part")
        .withColumn("hops", col("hops").cast("long")), Seq("part"), "left")
      .orderBy(col("part"))
    noop(joined)
    val t5 = System.nanoTime()
    println(f"[edgeprof] q205 final join phase           ${(t5 - t4) / 1e9}%7.2f s")
    println(f"[edgeprof] q205 total                      ${(t5 - t0) / 1e9}%7.2f s")
    reset()
    }
    spark.stop()
  }
}
