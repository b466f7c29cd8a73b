package graft.core

import graft.SparkSpecBase
import org.apache.spark.sql.types._

class JsonSchemaSpec extends SparkSpecBase {

  test("okta-style schema JSON -> StructType with mode semantics") {
    val json =
      """[
        {"name": "id", "type": "STRING", "mode": "REQUIRED"},
        {"name": "created", "type": "TIMESTAMP", "mode": "NULLABLE"},
        {"name": "login_count", "type": "INTEGER"},
        {"name": "score", "type": "FLOAT"},
        {"name": "profile", "type": "STRING"},
        {"name": "tags", "type": "STRING", "mode": "REPEATED"},
        {"name": "money", "type": "BIGNUMERIC"},
        {"name": "addr", "type": "RECORD", "fields": [
          {"name": "city", "type": "STRING"}]}
      ]"""
    val st = JsonSchema.fromJson(json)
    assert(st("id").dataType == StringType && !st("id").nullable)
    assert(st("created").dataType == TimestampType && st("created").nullable)
    assert(st("login_count").dataType == LongType)
    assert(st("score").dataType == DoubleType)
    assert(st("tags").dataType == ArrayType(StringType))
    assert(st("money").dataType == DecimalType(38, 18)) // narrowed, SURVEY §1.2
    assert(st("addr").dataType == StructType(Seq(StructField("city", StringType))))
  }

  test("loaded schema drives conformToSchema end-to-end") {
    import spark.implicits._
    val st = JsonSchema.fromJson(
      """[{"name":"id","type":"STRING"},{"name":"lastUpdated","type":"TIMESTAMP"},
          {"name":"missing_col","type":"INTEGER"}]""")
    val df = Seq(("u1", "2026-06-01T10:00:00Z", "extra")).toDF("id", "lastUpdated", "rogue")
    val out = SchemaConform.conformToSchema(df, st)
    assert(out.columns.toSeq == Seq("id", "lastUpdated", "missing_col"))
    assert(out.schema("lastUpdated").dataType == TimestampType)
    assert(out.head().isNullAt(2))
  }

  test("unknown type token fails loudly") {
    intercept[IllegalArgumentException] {
      JsonSchema.fromJson("""[{"name":"x","type":"GEOGRAPHY5"}]""")
    }
  }
}
