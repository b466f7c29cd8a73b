package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class ProfilerSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile: nulls, exact ndv, NATIVE-order min/max, column order kept") {
    val df = Seq(
      (Some(100L), Some("b")), (Some(9L), Some("a")),
      (Some(9L), None), (None, Some("a")))
      .toDF("num", "str")
    val rows = Profiler.profile(df, Seq("num" -> col("num"), "str" -> col("str")))
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("num", "str"), "caller's order")
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    // min/max must be numeric order: 9 < 100 (string order would say "100" < "9")
    assert(byName("num") == ((4L, 1L, 2L, "9", "100")))
    assert(byName("str") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profile accepts derived projections (quantized money)") {
    val df = Seq(1.25, 3.999, 3.999).toDF("price")
    val r = Profiler.profile(df,
      Seq("cents" -> floor(col("price") * 100.0).cast("long"))).head()
    assert((r.getLong(3), r.getString(4), r.getString(5)) == ((2L, "125", "399")))
  }
}
