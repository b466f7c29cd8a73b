package graft.core

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SchemaConformSpec extends SparkSpecBase {
  import spark.implicits._

  test("conformToSchema casts, adds missing as typed nulls, drops extras, reorders") {
    val df = Seq(("1", "alice", 99)).toDF("id", "name", "junk")
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("id", LongType),
      StructField("score", DoubleType)))
    val out = SchemaConform.conformToSchema(df, schema)
    assert(out.schema.fields.map(_.name).toSeq == Seq("name", "id", "score"))
    assert(out.schema("id").dataType == LongType)
    assert(out.schema("score").dataType == DoubleType)
    val row = out.collect().head
    assert(row.getString(0) == "alice")
    assert(row.getLong(1) == 1L)
    assert(row.isNullAt(2))
  }

  test("nullifySentinels keeps Namibia's NA but nulls the default tokens") {
    val df = Seq(("NA", "Namibia"), ("NULL", "nowhere"), ("", "empty"), ("US", "USA"))
      .toDF("code", "name")
    val out = SchemaConform.nullifySentinels(df, Seq("code"), SchemaConform.DefaultNaValues)
      .collect().map(r => (r.getString(1), if (r.isNullAt(0)) null else r.getString(0))).toMap
    assert(out("Namibia") == "NA")       // NA deliberately NOT a null token
    assert(out("nowhere") == null)
    assert(out("empty") == null)
    assert(out("USA") == "US")
  }

  test("sentinel datetime 0000-00-00 maps to null") {
    val df = Seq(("0000-00-00 00:00:00", 1), ("2026-06-01 10:00:00", 2)).toDF("d", "k")
    val out = SchemaConform.nullifySentinels(df, Seq("d"), Seq("0000-00-00 00:00:00"))
    assert(out.filter($"d".isNull).count() == 1)
  }
}
