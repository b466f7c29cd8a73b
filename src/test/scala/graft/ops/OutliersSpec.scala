package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpecBase {
  import spark.implicits._

  test("flags only rows beyond the per-group z threshold, with exact stats") {
    // Group a: nine 10.0s and one 20.0 -> mean 11, var (81+9)/10=9, sd 3;
    // z(20)=3, z(10)=-1/3. Group b: all equal -> sd 0, z undefined (NaN,
    // never flagged).
    val rows = ((1 to 9).map(i => (i.toLong, "a", 10.0)) :+ ((10L, "a", 20.0))) ++
      (11 to 14).map(i => (i.toLong, "b", 5.0))
    val df = rows.toDF("id", "grp", "value")
    val out = Outliers.zscoreOutliers(df, "grp", "value", 2.5).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("id") == 10L)
    assert(r.getAs[Double]("grp_mean") == 11.0)
    assert(r.getAs[Double]("grp_sd") == 3.0)
    assert(r.getAs[Double]("z") == 3.0)
  }

  test("threshold is exclusive and group-local") {
    // z exactly == threshold must NOT flag (strict >)
    val df = ((1 to 9).map(i => (i.toLong, "a", 10.0)) :+ ((10L, "a", 20.0)))
      .toDF("id", "grp", "value")
    assert(Outliers.zscoreOutliers(df, "grp", "value", 3.0).count() == 0)
    assert(Outliers.zscoreOutliers(df, "grp", "value", 2.9999).count() == 1)
  }

  test("output keeps all input columns plus diagnostics") {
    val df = ((1 to 9).map(i => (i.toLong, "a", 10.0)) :+ ((10L, "a", 20.0)))
      .toDF("id", "grp", "value").withColumn("extra", lit("x"))
    val out = Outliers.zscoreOutliers(df, "grp", "value", 2.5)
    assert(out.columns.toSet ==
      Set("id", "grp", "value", "extra", "grp_mean", "grp_sd", "z"))
  }

  test("robustOutliers: hand-traced median, MAD, and 3·MAD fence") {
    import spark.implicits._
    // n=11, sorted values 1..10,100: med = 6th = 6;
    // deviations sorted 0,1,1,2,2,3,3,4,4,5,94 → mad = 6th = 3; fence 9 → only 100
    val a = (1L to 10L) :+ 100L
    val df = a.map(("a", _)).toDF("grp", "v")
    val r = Outliers.robustOutliers(df, Seq("grp"), col("v")).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((11L, 6L, 3L, 1L)))
  }

  test("robustOutliers: a wild minority cannot drag the fences (50% breakdown)") {
    import spark.implicits._
    // four wild points out of twelve barely move med/mad, all four flag;
    // the z-score screen's mean/sd would be dragged by the same points
    val df = ((1L to 8L) ++ Seq(1000L, 2000L, 3000L, 4000L)).map(("a", _)).toDF("grp", "v")
    val r = Outliers.robustOutliers(df, Seq("grp"), col("v")).collect()(0)
    // n=12: med = 6th = 6; devs sorted 0,1,1,2,2,3,3,4,4,... → mad = 3 → fence 9
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((6L, 3L, 4L)))
  }

  test("robustOutliers: MAD 0 degenerates to the strict fence; group-local; nulls skipped") {
    import spark.implicits._
    val df = (Seq.fill(6)(Option(10L)) ++ Seq(Some(11L), None)).map(("a", _))
      .toDF("grp", "v")
      .unionByName(Seq(("b", Option(5L)), ("b", Option(6L))).toDF("grp", "v"))
    def run(parts: Int) = Outliers.robustOutliers(df.repartition(parts), Seq("grp"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = run(1)
    // a: 7 non-null, med 10, mad 0 → the lone 11 flags; null row excluded
    assert(got("a") == ((7L, 10L, 0L, 1L)))
    // b: n=2, med = 1st = 5 (lower median), mad = |6-5| rank1 → 0 → 6 flags
    assert(got("b") == ((2L, 5L, 0L, 1L)))
    assert(run(7) == got, "partition-independent")
  }
}
