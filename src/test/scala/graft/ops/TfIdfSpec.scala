package graft.ops

import graft.SparkSpecBase

class TfIdfSpec extends SparkSpecBase {
  import spark.implicits._

  // 4 docs; "common" in all, "rare" in one, "pair" in two.
  private lazy val docs = Seq(
    (1L, "common rare rare common"),
    (2L, "common pair"),
    (3L, "common pair  pair"), // double space: empty token must drop
    (4L, "common")
  ).toDF("doc_id", "text")

  test("tfidf computes exact tf/df/n_docs and ln-scaled score") {
    val out = TfIdf.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Long]("n_docs"),
          r.getAs[Double]("tfidf"))).toMap
    assert(out((1L, "rare")) == ((2L, 1L, 4L, 2.0 * math.log(4.0))))
    assert(out((1L, "common")) == ((2L, 4L, 4L, 2.0 * math.log(1.0))))
    assert(out((3L, "pair")) == ((2L, 2L, 4L, 2.0 * math.log(2.0))))
    assert(out((2L, "pair")) == ((1L, 2L, 4L, 1.0 * math.log(2.0))))
    // every (doc, term) pair present exactly once
    assert(out.size == 7)
  }

  test("topTerms ranks by score desc with term-asc tie-break") {
    val top = TfIdf.topTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "term").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "rare")   // 2·ln4 beats common's 0
    assert(top(3L) == "pair")
    // doc 4 has only the zero-scored "common"; still returned (k=1)
    assert(top(4L) == "common")
  }
}
