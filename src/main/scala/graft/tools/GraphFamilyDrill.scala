package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared-capture wall drill (r16 verdict directive #2 "Done ="):
  * a multi-op sequence — connected components, label propagation,
  * PageRank, BFS — over ONE co-purchase graph, run two ways:
  *
  *   DIRECT  each operator's standalone form; each pays its own
  *           |E|-sized capture (materialize + count + s-partitioned
  *           re-materialize) of the same edge relation — four captures
  *           for four answers;
  *   SHARED  [[graft.ops.GraphCapture]] pays the capture ONCE and all
  *           four operators run rounds-only against it.
  *
  * The graph is the q93/q108/q137 basket graph: co-purchase edges from
  * k disjoint-key copies of the sf0.1 lineitem (k = 10 ≈ sf1 edge
  * volume; the GraphSf1Probe replication — baskets stay intact, the
  * graph becomes k disjoint copies). [[graft.ops.BasketEdges]] output
  * carries both directions, distinct, self-loop-free, so the capture's
  * symmetric contract holds by construction (symmetrize = false) and
  * the direct forms take their assumeSymmetric/edgesDistinct fast
  * paths — the comparison isolates exactly the per-op capture cost.
  *
  * Equality is asserted, not assumed: per op, row count + a bit_xor of
  * xxhash64(id, value) must match across legs (the CcEqProbe
  * signature). The edge list itself is pre-materialized once, outside
  * both legs, so neither pays the basket self-join.
  *
  *   ./run_local.sh graft.tools.GraphFamilyDrill [sfDir] [k]
  */
object GraphFamilyDrill {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val sc = spark.sparkContext
    val mx = graft.bench.QueryMetricsListener.install(spark)

    val li0 = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val stride = 100000000L
    val li = (0 until k).map { i =>
      li0.select((col("l_orderkey") + i * stride).as("l_orderkey"),
        (col("l_partkey") + i * stride).as("l_partkey"))
    }.reduce(_ unionByName _).localCheckpoint(true)

    // ONE materialized edge list feeds both legs (both directions,
    // distinct, self-loop-free by BasketEdges contract)
    val edges = graft.ops.BasketEdges.edges(li, "l_orderkey", "l_partkey")
      .localCheckpoint(true)
    val nEdges = edges.count()
    println(s"[gfam] k=$k lineitem=${li.count()} directedEdges=$nEdges")
    val sources = li.select(col("l_partkey").as("id")).distinct()
      .filter(col("id") % 50 === 0).localCheckpoint(true)

    val keep = sc.getPersistentRDDs.keySet.toSet
    def sweep(): Unit = {
      graft.ops.CacheHygiene.quietRelease {
        (sc.getPersistentRDDs.keySet.toSet -- keep).foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      }
      System.gc()
    }
    // signature: (rows, bit_xor of xxhash64(all columns)) — portable
    // across plans, order-insensitive
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), expr(
        s"bit_xor(xxhash64(${df.columns.map(c => s"cast(`$c` as string)").mkString(", ")}))"))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def timed(label: String)(f: => DataFrame): ((Long, Long), Double, Long) = {
      mx.reset()
      val t0 = System.nanoTime()
      val df = f
      val s = sig(df)
      val dt = (System.nanoTime() - t0) / 1e9
      val m = mx.read(spark)
      println(f"[gfam] $label%-22s ${dt}%7.1fs rows=${s._1}%-9d " +
        f"shufW=${m.shuffleWriteRows}%-11d spillMB=${m.spillDiskBytes / 1e6}%6.0f")
      (s, dt, m.shuffleWriteRows)
    }

    import graft.ops._
    // ---- DIRECT leg: each op pays its own capture ----
    sweep()
    val ccPairs = edges.select(col("src").as("id_a"), col("dst").as("id_b"))
    val (ccD, tCcD, wCcD) = timed("direct cc") {
      Dedup.connectedComponents(ccPairs, driverMaxEdges = 0, assumeSymmetric = true)
    }
    sweep()
    val (lpD, tLpD, wLpD) = timed("direct labelprop") {
      LabelProp.labelPropagation(edges, "src", "dst", iterations = 3,
        assumeSymmetric = true)
    }
    sweep()
    val (prD, tPrD, wPrD) = timed("direct pagerank") {
      PageRank.pageRank(edges, "src", "dst", iterations = 2)
    }
    sweep()
    val (bfD, tBfD, wBfD) = timed("direct bfs") {
      // the q108 gate shape: one-orientation pair list + edgesDistinct
      // (the direct form's own fast path — fair to the direct leg; a
      // both-direction input would force its defensive full dedup)
      val oneWay = edges.filter(col("src") < col("dst"))
      val r = Bfs.hopDistance(oneWay, sources, "src", "dst", maxHops = 3,
        edgesDistinct = true)
      val out = r.localCheckpoint()
      CacheHygiene.release(r)
      out
    }
    val directTotal = tCcD + tLpD + tPrD + tBfD
    println(f"[gfam] DIRECT total (4 ops, 4 captures): ${directTotal}%7.1fs " +
      f"shufW=${wCcD + wLpD + wPrD + wBfD}")

    // ---- SHARED leg: one capture, four rounds-only consumers ----
    sweep()
    mx.reset()
    val t0 = System.nanoTime()
    val g = GraphCapture.capture(edges, "src", "dst", symmetrize = false)
    val tCap = (System.nanoTime() - t0) / 1e9
    val mCap = mx.read(spark)
    println(f"[gfam] shared capture        ${tCap}%7.1fs edges=${g.edgeCount}%-9d " +
      f"shufW=${mCap.shuffleWriteRows}")
    val (ccS, tCcS, wCcS) = timed("shared cc") {
      Dedup.connectedComponents(g, maxIter = 50, driverMaxEdges = 0)
    }
    val (lpS, tLpS, wLpS) = timed("shared labelprop") {
      LabelProp.labelPropagation(g, iterations = 3)
    }
    val (prS, tPrS, wPrS) = timed("shared pagerank") {
      PageRank.pageRank(g, iterations = 2)
    }
    val (bfS, tBfS, wBfS) = timed("shared bfs") {
      val r = Bfs.hopDistance(g, sources, maxHops = 3)
      val out = r.localCheckpoint()
      CacheHygiene.release(r)
      out
    }
    g.release()
    val sharedTotal = tCap + tCcS + tLpS + tPrS + tBfS
    println(f"[gfam] SHARED total (1 capture + 4 ops): ${sharedTotal}%7.1fs " +
      f"shufW=${mCap.shuffleWriteRows + wCcS + wLpS + wPrS + wBfS}")

    // ---- equality across legs (hard assertion) ----
    val eq = Seq("cc" -> (ccD, ccS), "labelprop" -> (lpD, lpS),
      "pagerank" -> (prD, prS), "bfs" -> (bfD, bfS))
    eq.foreach { case (name, (d, s)) =>
      require(d == s, s"$name diverged across legs: direct=$d shared=$s")
      println(s"[gfam] equal: $name rows=${d._1} sig=${d._2}")
    }
    println(f"[gfam] wall delta: direct ${directTotal}%.1fs -> shared " +
      f"${sharedTotal}%.1fs (${(1 - sharedTotal / directTotal) * 100}%.1f%% saved)")
    spark.stop()
  }
}
