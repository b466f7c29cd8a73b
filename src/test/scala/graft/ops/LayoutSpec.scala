package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("zValue interleaves bits: x at even, y at odd positions") {
    val rows = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L), ((1L << 30) | 1L, 1L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // x=101b,y=011b -> z = x bits at 0,2,4 / y bits at 1,3,5 = 011011b = 27
    assert(rows((5L, 3L)) == 27L)
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L)
    assert(rows((0L, 1L)) == 2L)
    // top bit (b=30) of x lands at position 60
    assert(rows(((1L << 30) | 1L, 1L)) == (1L << 60) + 3L)
  }

  test("zValue is monotone-compatible: equal prefixes cluster") {
    // points in the same 2^k-aligned quad share the z high bits —
    // spot-check that two nearby points sort between-distant ones
    val z = (x: Long, y: Long) =>
      Seq((x, y)).toDF("x", "y").select(Layout.zValue(col("x"), col("y")))
        .head().getLong(0)
    assert(z(2, 2) < z(5, 6), "quad (0..3)^2 sorts before quad (4..7)^2")
    assert(z(1, 0) < z(2, 0) == (1 < 2))
  }

  test("zorderFileStats deals equal-count files and tightens both dims") {
    // a 32x32 grid: linear sort on x gives full-range y envelopes;
    // z-order must bound BOTH dims per file
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x * 32L + y, x.toLong, y.toLong)))
      .toDF("id", "x", "y")
    val stats = Layout.zorderFileStats(grid, "id", "x", "y", numFiles = 16)
      .collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 1024L)
    assert(stats.length == 16)
    // floor-rank deal: every file gets exactly 1024/16 rows
    assert(stats.forall(_.getAs[Long]("n_rows") == 64L))
    // each file of a 16-file z-layout over a 32x32 grid is a quad of
    // side 8: both envelopes span 8 values, not 32
    stats.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") == 7, r)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") == 7, r)
    }
  }

  test("file assignment is deterministic under arbitrary partitioning") {
    val pts = (0L until 500L).map(i => (i, (i * 7919) % 1000, (i * 104729) % 1000))
      .toDF("id", "x", "y")
    val a = Layout.zorderFileStats(pts, "id", "x", "y", 8)
      .orderBy("file_id").collect().toSeq
    val b = Layout.zorderFileStats(pts.repartition(13), "id", "x", "y", 8)
      .orderBy("file_id").collect().toSeq
    assert(a == b)
  }

  test("null keys/dims are dropped, not mis-bucketed") {
    val pts = Seq((Some(1L), Some(1L), Some(1L)), (None, Some(2L), Some(2L)),
      (Some(3L), None, Some(3L))).toDF("id", "x", "y")
    val total = Layout.zorderFileStats(pts, "id", "x", "y", 2)
      .agg(sum("n_rows")).head().getLong(0)
    assert(total == 1L)
  }
}
