package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed range join == exact nested-loop result, boundaries honored") {
    val points = Seq(0L, 5L, 10L, 99L, 100L, 101L, 250L, 999L).toDF("p")
    val intervals = Seq(
      (1L, 0L, 100L),    // [0,100): 0,5,10,99
      (2L, 100L, 101L),  // [100,101): 100 only
      (3L, 90L, 260L),   // overlaps bucket edges
      (4L, 500L, 600L)   // empty
    ).toDF("iv_id", "s", "e")

    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointsInIntervals(points, "p", intervals, "s", "e", width)
        .select("iv_id", "p").as[(Long, Long)].collect().sorted.toSeq
      val expected = points.crossJoin(intervals)
        .filter($"p" >= $"s" && $"p" < $"e")
        .select("iv_id", "p").as[(Long, Long)].collect().sorted.toSeq
      assert(got == expected, s"width=$width")
      // no duplicates: each (interval, point) pair appears exactly once
      assert(got.distinct == got, s"width=$width dupes")
    }
  }
}
