package graft.tools

import org.apache.spark.sql.functions._

/** Capture-width sweep for the iterative graph family (r18, the
  * VERDICT #3 "cap mirror" measurement): how does the wall of the
  * shared-capture graph ops change with the WIDTH of the captured
  * edge relation, at fixed data and fixed cores?
  *
  * The r17 driver bench showed q93/q137/q205 INVERSE core scaling at
  * sf0.1 (whole suite faster on 8 cores than 32): the capture's
  * repartition runs at session width with AQE off, so a ~1–2M-edge
  * graph fans 32-wide and every round multiplies the per-task fixed
  * cost. This drill isolates exactly that axis: the edge relation is
  * built ONCE at full session width (the build is not under test),
  * then re-cut at each width w and the rounds-only operators timed —
  * the same shape the ShuffleSizing cap produces in the product
  * (capture at session width, count, re-cut narrow when the
  * edge-derived target is far below the session value).
  *
  * Per width: capture re-cut wall, LabelProp(3), PageRank(2),
  * BFS(3 hops), CC, plus a result checksum that must be identical
  * across widths (width is a plan choice, never a result change).
  *
  *   SPARK_GRAFT_CPUS=32 ./run_local.sh graft.tools.GraphWidthDrill [sfDir] [widths]
  */
object GraphWidthDrill {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val widths = (if (args.length > 1) args(1) else "32,16,8,4,2,1")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)

    def time[T](label: String)(body: => T): (T, Double) = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      (r, dt)
    }
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val cols = df.columns.map(c => col(c).cast("string"))
      val r = df.select(xxhash64(cols: _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // the q93/q108/q137 co-purchase graph, built once at session width
    val li = graft.core.Tables.table(spark, dir, "lineitem")
    val (edges0, tBuild) = time("edge build (once, session width)") {
      val e = graft.ops.BasketEdges.edges(li, "l_orderkey", "l_partkey").localCheckpoint()
      e.count()
      e
    }
    val edgeRows = edges0.count()
    val sources = graft.core.Tables.table(spark, dir, "part")
      .filter(col("p_partkey") % 50 === 0).select(col("p_partkey")).localCheckpoint()
    sources.count()
    System.err.println(f"[widthdrill] sfDir=$dir edges=$edgeRows%,d build=$tBuild%.2f s " +
      s"cores=$cpus targetPartitions=${graft.ops.ShuffleSizing.targetPartitions(edgeRows)}")

    var baseline: Option[Map[String, (Long, Long)]] = None
    println(f"${"w"}%4s ${"recut"}%8s ${"lp3"}%8s ${"pr2"}%8s ${"bfs3"}%8s ${"cc"}%8s ${"total"}%8s")
    for (w <- widths) {
      val key = "spark.sql.shuffle.partitions"
      spark.conf.set(key, w.toString)
      try {
        val (g, tCap) = time(s"w=$w capture recut") {
          graft.ops.GraphCapture.capture(edges0, "src", "dst", symmetrize = false)
        }
        val (lp, tLp) = time(s"w=$w lp3") {
          val r = graft.ops.LabelProp.labelPropagation(g, iterations = 3); r.count(); r
        }
        val (pr, tPr) = time(s"w=$w pr2") {
          val r = graft.ops.PageRank.pageRank(g, iterations = 2); r.count(); r
        }
        val (bf, tBf) = time(s"w=$w bfs3") {
          val r = graft.ops.Bfs.hopDistance(g, sources, maxHops = 3); r.count(); r
        }
        val (cc, tCc) = time(s"w=$w cc") {
          val r = graft.ops.Dedup.connectedComponents(g, maxIter = 50, driverMaxEdges = 0)
          r.count(); r
        }
        val sigs = Map("lp" -> sig(lp), "pr" -> sig(pr), "bfs" -> sig(bf), "cc" -> sig(cc))
        baseline match {
          case None => baseline = Some(sigs)
          case Some(b) => require(b == sigs,
            s"width $w changed results: $sigs vs $b — width must be a pure plan choice")
        }
        graft.ops.CacheHygiene.release(bf)
        g.release()
        val total = tCap + tLp + tPr + tBf + tCc
        println(f"$w%4d $tCap%8.2f $tLp%8.2f $tPr%8.2f $tBf%8.2f $tCc%8.2f $total%8.2f")
      } finally spark.conf.set(key, cpus)
    }
    spark.stop()
  }
}
