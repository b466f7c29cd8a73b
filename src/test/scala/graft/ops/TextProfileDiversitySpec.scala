package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class TextProfileDiversitySpec extends SparkSpecBase {
  import spark.implicits._

  test("ngramDiversity counts trigram instances vs types per group") {
    val docs = Seq((1L, "a b c a b c", "s1"), (2L, "x y", "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextProfile.ngramDiversity(docs, "source", "text", n = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // s1 trigrams: "a b c","b c a","c a b","a b c" -> 4 instances, 3 types
    assert(got == Map("s1" -> ((4L, 3L, 750000L))))
  }

  test("unigram diversity is the plain type-token ratio") {
    val docs = Seq((1L, "t t u", "s")).toDF("doc_id", "text", "source")
    val got = TextProfile.ngramDiversity(docs, "source", "text", n = 1)
      .head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((3L, 2L, 666666L)))
  }

  test("repetitive slices score lower than diverse ones") {
    val docs = ((1L to 20L).map(i => (i, "the same line over and over", "dull")) ++
      (21L to 40L).map(i => (i, s"fresh words n${i}a n${i}b n${i}c n${i}d", "varied")))
      .toDF("doc_id", "text", "source")
    val ttr = TextProfile.ngramDiversity(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ttr("dull") < ttr("varied"))
  }

  test("readability: hand-computed Flesch milli-units; fragments floor sentences at 1") {
    val docs = Seq((1L, "The cat sat. The dog ran!"), (2L, "no terminal punctuation here"),
      (3L, "   ")).toDF("doc_id", "text")
    val got = TextProfile.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc1: W=6 S=2 Y=6 -> 206835 - 3045 - 84600 = 119190
    assert(got(1L) == ((6L, 2L, 6L, 119190L)))
    // doc2: W=4 S=1 (floored) Y: o,ua,io,e,e... count vowel runs:
    // "no"(o) "terminal"(e,i,a) "punctuation"(u,ua,io) "here"(e,e) = 9
    assert(got(2L)._2 == 1L && got(2L)._1 == 4L)
    assert(got(2L)._4 ==
      206835L - (1015L * 4) / 1 - (84600L * got(2L)._3) / 4)
    // blank doc drops
    assert(!got.contains(3L))
  }

  test("groups are independent of partitioning; case folds") {
    val docs = Seq((1L, "A b C", "s"), (2L, "a B c", "s")).toDF("doc_id", "text", "source")
    val one = TextProfile.ngramDiversity(docs, "source", "text").head()
    // both docs contribute the same folded trigram: 2 instances, 1 type
    assert((one.getLong(1), one.getLong(2)) == ((2L, 1L)))
    val re = TextProfile.ngramDiversity(docs.repartition(7), "source", "text").head()
    assert(one == re)
  }
}
