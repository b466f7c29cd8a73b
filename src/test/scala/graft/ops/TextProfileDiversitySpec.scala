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

  test("groups are independent of partitioning; case folds") {
    val docs = Seq((1L, "A b C", "s"), (2L, "a B c", "s")).toDF("doc_id", "text", "source")
    val one = TextProfile.ngramDiversity(docs, "source", "text").head()
    // both docs contribute the same folded trigram: 2 instances, 1 type
    assert((one.getLong(1), one.getLong(2)) == ((2L, 1L)))
    val re = TextProfile.ngramDiversity(docs.repartition(7), "source", "text").head()
    assert(one == re)
  }
}
