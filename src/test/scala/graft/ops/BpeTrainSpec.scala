package graft.ops

import graft.SparkSpecBase

class BpeTrainSpec extends SparkSpecBase {
  import spark.implicits._

  private def merges(texts: String*): Seq[(Int, String, String, Long)] =
    BpeTrain.learnMerges(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text"), "text", nMerges = 5)
      .map(m => (m.step, m.lhs, m.rhs, m.cnt))

  test("classic merge order: most frequent weighted pair first") {
    // words: ab x2, ac x1 -> (a,b)=2 wins, then (a,c)=1, then dry
    assert(merges("ab ab ac") == Seq((1, "a", "b", 2L), (2, "a", "c", 1L)))
  }

  test("greedy in-word scan: runs merge left-to-right non-overlapping") {
    // "aaa" = [a,a,a]: (a,a) has 2 instances; after the merge the word
    // is [aa, a] (NOT [a, aa]) so step 2 must be (aa, a)
    assert(merges("aaa") == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
    // "aaaa" collapses pairwise to [aa, aa], then to one symbol, then dry
    assert(merges("aaaa") == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("ties break lexicographically on the pair") {
    val got = merges("xy xy zw zw")
    assert(got == Seq((1, "x", "y", 2L), (2, "z", "w", 2L)))
  }

  test("counts weight by word frequency and lowercase-fold") {
    // "Th th TH" -> word 'th' freq 3 -> (t,h)=3
    assert(merges("Th th TH").head == ((1, "t", "h", 3L)))
  }

  test("merged symbols join further merges across steps") {
    // 'abc' x3: (a,b)=3 then (ab,c)=3
    assert(merges("abc abc abc") == Seq((1, "a", "b", 3L), (2, "ab", "c", 3L)))
  }

  test("encodedTokenCounts: applied merges shrink token counts; fertility is exact") {
    val docs = Seq((1L, "ab ab ac"), (2L, "zz")).toDF("id", "text")
    // one merge (a,b): 'ab'->1 sym, 'ac'->2, 'zz'->2 (z,z never merged)
    val m1 = BpeTrain.learnMerges(docs, "text", 1)
    assert(m1 == Seq(BpeTrain.Merge(1, "a", "b", 2L)))
    val got1 = BpeTrain.encodedTokenCounts(docs, "id", "text", m1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got1 == Map(1L -> ((3L, 4L, 1333333L)), 2L -> ((1L, 2L, 2000000L))))
    // with no merges every char is a token
    val got0 = BpeTrain.encodedTokenCounts(docs, "id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got0 == Map(1L -> 6L, 2L -> 2L))
  }

  test("driver fast path and distributed path learn bit-identical merge lists") {
    // meaty enough for repeated symbols, ties, and chained merges;
    // learnMergesInstrumented pins the distributed path regardless of
    // size, learnMerges takes the small-corpus driver loop
    val docs = (1L to 200L).map(i =>
        (i, s"th${i % 7}e quick br${i % 3}own the the fox f${i % 5}ox"))
      .toDF("id", "text")
    val driver = BpeTrain.learnMerges(docs, "text", 12)
    val (dist, _) = BpeTrain.learnMergesInstrumented(docs, "text", 12)
    assert(driver == dist)
    assert(driver.size == 12)
    // and the limit really gates the path: limit 0 = distributed
    val forced = BpeTrain.learnMerges(docs, "text", 12, driverWordLimit = 0L)
    assert(forced == driver)
  }

  test("merge list is independent of input partitioning") {
    val docs = (1L to 100L).map(i => (i, s"w${i % 5}x w${i % 3}y common common"))
      .toDF("id", "text")
    val a = BpeTrain.learnMerges(docs, "text", 5)
    val b = BpeTrain.learnMerges(docs.repartition(13), "text", 5)
    assert(a == b && a.size == 5)
  }
}
