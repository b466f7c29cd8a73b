package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r10 directive #8: a genuine sf1-scale run of the iterative graph
  * trio (q93 PageRank / q108 BFS / q137 label propagation) with real
  * shuffle volumes, not just the k×-replication cost series.
  *
  * No sf1 fixture ships, so the probe builds one: 10 disjoint-key
  * copies of the sf0.1 lineitem (order and part keys offset per copy —
  * baskets stay intact, the graph becomes 10 disjoint copies, edge and
  * node volume grow 10×, exactly TPC-H's own scaling of the
  * co-purchase structure). AQE stays at session defaults so its
  * runtime re-planning (coalesce/skew) is part of what's measured.
  *
  * For each operator it records wall time AND the completed-stage
  * count at k=1 (the sf0.1 shape) vs k=10 (sf1 volume): an
  * iteration-bound plan must hold its stage count constant while only
  * per-stage volume grows — a stage-count blowup would mean the plan
  * shape itself degraded with data size. */
object GraphSf1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"

    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })

    val li0 = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val stride = 100000000L
    def replicated(k: Int): DataFrame =
      (0 until k).map { i =>
        li0.select((col("l_orderkey") + i * stride).as("l_orderkey"),
          (col("l_partkey") + i * stride).as("l_partkey"))
      }.reduce(_ unionByName _).localCheckpoint(true)

    // the listener bus is asynchronous: stage-completed events can
    // still be queued when the action returns, which would leak one
    // operator's tail stages into the next measurement — require the
    // counter to hold still across THREE consecutive 300 ms windows
    // (a single quiet window can be a bus stall / GC pause mid-drain,
    // not a drained queue)
    def settledStages(): Int = {
      var prev = -1
      var stable = 0
      var cur = stages.get()
      while (stable < 3) {
        Thread.sleep(300)
        prev = cur; cur = stages.get()
        stable = if (cur == prev) stable + 1 else 0
      }
      cur
    }

    def measure(name: String, k: Int)(f: => Long): Unit = {
      val s0 = settledStages()
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[graph-sf1] k=$k%-3d $name%-10s ${sec}%8.2fs rows=$n%-9d stages=${settledStages() - s0}")
    }

    for (k <- Seq(1, 10)) {
      val li = replicated(k)
      println(s"[graph-sf1] k=$k lineitem rows=${li.count()}")
      // q93 shape: basket edges + 2 integer-exact PageRank iterations
      measure("pagerank", k) {
        val edges = graft.ops.BasketEdges.edges(li, "l_orderkey", "l_partkey")
        graft.ops.PageRank.pageRank(edges, "src", "dst", iterations = 2).count()
      }
      // q108 shape: support-thresholded edges + 3-hop BFS
      measure("bfs", k) {
        val dli = li.distinct()
        val a = dli.select(col("l_orderkey"), col("l_partkey").as("p1"))
        val b = dli.select(col("l_orderkey"), col("l_partkey").as("p2"))
        val edges = a.join(b, "l_orderkey").filter(col("p1") < col("p2"))
          .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 2).select(col("p1"), col("p2"))
        val sources = li.select(col("l_partkey").as("p_partkey"))
          .distinct().filter(col("p_partkey") % 50 === 0)
        graft.ops.Bfs.hopDistance(edges, sources, "p1", "p2", maxHops = 3,
          edgesDistinct = true).count()
      }
      // q137 shape: 3 label-propagation rounds over symmetric edges
      measure("labelprop", k) {
        val edges = graft.ops.BasketEdges.edges(li, "l_orderkey", "l_partkey")
        graft.ops.LabelProp.labelPropagation(edges, "src", "dst", iterations = 3,
          assumeSymmetric = true).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
