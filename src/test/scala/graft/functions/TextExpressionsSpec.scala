package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  // explicit escapes — editors/tools silently re-compose unicode literals
  private val decomposed = "cafe\u0301"   // 'e' + combining acute (5 code points)
  private val composed = "caf\u00e9"      // precomposed e-acute (4 code points)

  test("nfc_normalize composes decomposed sequences and is identity on NFC text") {
    TextExpressions.register(spark)
    val df = Seq((1L, decomposed), (2L, composed), (3L, "ascii only"), (4L, null))
      .toDF("id", "t")
      .select($"id", TextExpressions.nfcNormalize($"t").as("n"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(1L).get == composed)            // composed output
    assert(rows(2L).get == composed)            // already-NFC fast path: unchanged
    assert(rows(3L).get == "ascii only")
    assert(rows(1L).get.length == 4 && decomposed.length == 5) // one code point fewer
    assert(rows(4L).isEmpty)                    // null-safe
  }

  test("interpreted eval matches codegen output") {
    TextExpressions.register(spark)
    val data = Seq(decomposed, composed, s"mixed $composed and $decomposed", "")
    // factoryMode=NO_CODEGEN forces InterpretedUnsafeProjection — the
    // nullSafeEval path; wholeStage alone still runs generated
    // projections and would never exercise it
    def run(mode: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try data.toDF("t").select(TextExpressions.nfcNormalize($"t")).as[String].collect().toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }

  test("nfc_normalize is callable from SQL and injectable via GraftExtensions") {
    // the extensions entry point must register without throwing
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    TextExpressions.register(spark)
    val out = spark.sql("SELECT nfc_normalize('cafe\\u0301') AS n").head().getString(0)
    assert(out == composed)
  }
}
