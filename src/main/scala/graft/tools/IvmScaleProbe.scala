package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVM family's central scale claim, measured: a maintenance merge
  * touches the DELTA (one hash agg) and the STATE (aggregate-sized),
  * and the base table appears NOWHERE in the plan — so with a FIXED
  * delta, per-batch refresh cost must stay FLAT while the base the
  * state summarizes grows k×. The init aggregate is allowed to grow
  * (it scans the base once); the per-batch path is what IVM exists
  * for.
  *
  * Regime: lineitem replicated k× with disjoint part keys (groups grow
  * k× — state grows too, the honest worst case for the merge join),
  * delta fixed at copy 0's 10k-row slice. Times all three aggregate
  * classes: count/sum (q135 kernel), moments (q146), min/max reserves
  * (q143, no eviction — the rescan path is the measured-rare
  * exception, gated separately). */
object IvmScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val li0 = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("v"),
        col("l_orderkey"))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    for (k <- Seq(1, 2, 4, 8)) {
      // disjoint group ranges per copy: groups (and state) grow k× —
      // the honest worst case for the merge join's state side
      val base = (0 until k).map { i =>
        li0.select((col("l_partkey") + i * 100000L).as("g"), col("v"), col("l_orderkey"))
      }.reduce(_ unionByName _).localCheckpoint(true)
      // fixed delta: copy 0's slice, as mixed D+I (update pairs) — the
      // deletes hit mid-range values so the min/max reserves are
      // touched but never drained (no eviction, no base rescan)
      val slice = base.filter(col("g") < 100000 && col("l_orderkey") % 60 === 0)
      val delta = slice.select(col("g"), col("v"), lit("D").as("op"))
        .unionByName(slice.select(col("g"), (col("v") + 1L).as("v"), lit("I").as("op")))
        .localCheckpoint(true)
      val nd = delta.count()

      // init states once per k (cost scans the base — allowed to grow)
      val sSum = graft.ops.IncrementalAgg
        .aggState(base, Seq("g"), "v").localCheckpoint(true)
      val sMom = graft.ops.IncrementalAgg
        .aggStateMoments(base, Seq("g"), "v").localCheckpoint(true)
      val sMm = graft.ops.IncrementalMinMax
        .aggState(base, Seq("g"), "v", k = 4).localCheckpoint(true)

      val (tS, nS) = time(graft.ops.IncrementalAgg
        .mergeDelta(sSum, delta, Seq("g"), "v", "op").count())
      val (tM, nM) = time(graft.ops.IncrementalAgg
        .mergeDeltaMoments(sMom, delta, Seq("g"), "v", "op").count())
      val (tX, nX) = time(graft.ops.IncrementalMinMax
        .mergeDelta(sMm, delta, Seq("g"), "v", "op", k = 4).count())
      println(f"[ivm-scale] k=$k%-2d base=${base.count()}%-9d groups=$nS%-7d delta=$nd%-6d " +
        f"countsum=$tS%6.2fs moments=$tM%6.2fs($nM) minmax=$tX%6.2fs($nX)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
