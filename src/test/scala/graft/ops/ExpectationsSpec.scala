package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = df.head(); (r.getString(0), r.getLong(1), r.getBoolean(2))
  }

  test("expectUnique counts rows beyond the first per key; null keys exempt") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None).toDF("k")
    assert(row(Expectations.expectUnique("u", df, Seq("k"))) == (("u", 2L, false)))
    val clean = Seq(1L, 2L, 3L).toDF("k")
    assert(row(Expectations.expectUnique("u", clean, Seq("k"))) == (("u", 0L, true)))
  }

  test("expectRef counts orphans; null foreign keys are exempt (SQL FK rule)") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    assert(row(Expectations.expectRef("fk", child, "fk", parent, "pk")) ==
      (("fk", 1L, false)))
  }

  test("expect: NULL predicate is a violation (unknown fails the check)") {
    val df = Seq(Some(5.0), Some(50.0), None).toDF("v")
    assert(row(Expectations.expect("p", df, col("v") <= 10)) == (("p", 2L, false)))
    // empty input passes vacuously
    assert(row(Expectations.expect("p", df.filter(lit(false)), col("v") <= 10)) ==
      (("p", 0L, true)))
  }

  test("expectKAnonymity counts rows in sub-k equivalence classes; nulls group") {
    val df = Seq(("de", "a"), ("de", "a"), ("de", "a"), ("fr", "b"),
      (null.asInstanceOf[String], "b")).toDF("nation", "seg")
    // classes: (de,a)=3 ok at k=3; (fr,b)=1 and (null,b)=1 violate
    assert(row(Expectations.expectKAnonymity("k", df, Seq("nation", "seg"), 3)) ==
      (("k", 2L, false)))
    assert(row(Expectations.expectKAnonymity("k", df, Seq("nation", "seg"), 1)) ==
      (("k", 0L, true)))
  }

  test("audit unions rule results in order") {
    val df = Seq(1L, 1L).toDF("k")
    val out = Expectations.audit(Seq(
      Expectations.expectUnique("r1", df, Seq("k")),
      Expectations.expect("r2", df, col("k") > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == Seq(("r1", 1L, false), ("r2", 0L, true)))
  }
}
