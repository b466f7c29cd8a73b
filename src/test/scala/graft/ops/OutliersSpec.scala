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
}
