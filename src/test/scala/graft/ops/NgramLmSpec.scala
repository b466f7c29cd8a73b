package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class NgramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")

  test("docBigrams counts adjacent pairs with multiplicity") {
    val got = NgramLm.docBigrams(corpus, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, "a b") -> 2L, (1L, "b a") -> 1L,
      (2L, "a b") -> 1L, (2L, "b c") -> 1L))
  }

  test("model: conditional quanta are floor((1e6*c2)/c1) over bigram heads") {
    val m = NgramLm.model(NgramLm.docBigrams(corpus, "id", "text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // c2: "a b"->3, "b a"->1, "b c"->1; heads: a->3, b->2
    assert(m("a b") == ((3L, 3L, 1000000L)))
    assert(m("b a") == ((1L, 2L, 500000L)))
    assert(m("b c") == ((1L, 2L, 500000L)))
  }

  test("scoreDocs sums instance quanta; sub-2-token docs drop") {
    val scored = NgramLm.scoreDocs(
        corpus.union(Seq((3L, "solo"), (4L, "   ")).toDF("id", "text")),
        "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc1: 2x"a b" + 1x"b a" = 2*1e6 + 5e5; doc2: "a b" + "b c"
    assert(scored == Map(
      1L -> ((3L, 2500000L, 833333L)),
      2L -> ((2L, 1500000L, 750000L))))
  }

  test("tokenization is case-folded and whitespace-robust") {
    val got = NgramLm.docBigrams(Seq((1L, "  The  THE the ")).toDF("id", "text"),
        "id", "text")
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("the the" -> 2L))
  }

  test("score is independent of input partitioning") {
    val docs = (1L to 200L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 7}"))
      .toDF("id", "text")
    val a = NgramLm.scoreDocs(docs, "id", "text").orderBy("id").collect().toSeq
    val b = NgramLm.scoreDocs(docs.repartition(11), "id", "text").orderBy("id").collect().toSeq
    assert(a == b)
  }
}
