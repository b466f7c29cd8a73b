package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SqlSurfaceSpec extends SparkSpecBase {
  import spark.implicits._

  test("SQL surface: text/vector/sampling functions callable from spark.sql") {
    SqlSurface.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog again"),
        (2L, "the end")) // 2 tokens: fails the default gate, passes minTokens=1
      .toDF("doc_id", "text").createOrReplaceTempView("sql_surface_docs")

    val r = spark.sql(
      """SELECT doc_id,
               graft_token_count(text) AS n,
               graft_is_quality(text) AS q,
               graft_is_quality(text, 1, 50) AS q1,
               graft_fingerprint(text) AS fp,
               graft_lang_guess(text) AS lang,
               graft_hash_bucket(doc_id, 100) AS b,
               graft_split_label(doc_id) AS split,
               graft_shingles(text, 3) AS sh
         FROM sql_surface_docs ORDER BY doc_id""").collect()
    assert(r(0).getAs[Int]("n") == 10 && r(0).getAs[Boolean]("q"))
    assert(!r(1).getAs[Boolean]("q") && r(1).getAs[Boolean]("q1")) // literal overrides
    assert(r(0).getAs[String]("fp").length == 32)
    assert(Seq("train", "valid", "test").contains(r(0).getAs[String]("split")))
    assert(r(0).getAs[Long]("b") >= 0 && r(0).getAs[Long]("b") < 100)
    assert(r(0).getSeq[String](r(0).fieldIndex("sh")).head == "the quick brown")

    // SQL result == Scala API result (same Catalyst tree by construction)
    val viaSql = spark.sql(
      "SELECT graft_fingerprint(text) AS f FROM sql_surface_docs").as[String].collect().toSet
    val viaApi = spark.table("sql_surface_docs")
      .select(TextFunctions.fingerprint($"text").as("f")).as[String].collect().toSet
    assert(viaSql == viaApi)

    // vector functions (native VecDot rides along)
    val v = spark.sql(
      "SELECT vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, vec_l2_norm(array(3.0D, 4.0D)) AS n")
      .head()
    assert(v.getDouble(0) == 1.0 && v.getDouble(1) == 5.0)

    // scalar params must be literals
    intercept[Exception] {
      spark.sql("SELECT graft_hash_bucket(doc_id, doc_id) FROM sql_surface_docs").collect()
    }
  }
}
