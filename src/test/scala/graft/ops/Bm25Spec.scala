package graft.ops

import graft.SparkSpecBase

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  // d1: tf(a)=2 len=3 · d2: tf(a)=1 len=4 · d3: no query term
  private def docs = Seq(
    (1L, "a a b"), (2L, "a c c c"), (3L, "z z")
  ).toDF("doc_id", "text")

  private def expectedE4(tf: Long, len: Long, df: Long, n: Long, totalLen: Long,
                         k1: Double = 1.2, b: Double = 0.75): Long = {
    // same double dag as the operator, evaluated scalar-side
    val avglen = totalLen.toDouble / n.toDouble
    val idf = math.log((n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    val tfc = (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * (1.0 - b + (b * len.toDouble) / avglen))
    math.floor(idf * tfc * 10000.0 + 0.5).toLong
  }

  test("bm25E4 matches a scalar evaluation of the same formula") {
    val got = Bm25.bm25E4(docs, "doc_id", "text", Seq("a"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // N=3 (all docs tokenize), total len 3+4+2=9, df(a)=2
    assert(got == Map(
      1L -> (1L, 2L, 3L, expectedE4(tf = 2, len = 3, df = 2, n = 3, totalLen = 9)),
      2L -> (1L, 1L, 4L, expectedE4(tf = 1, len = 4, df = 2, n = 3, totalLen = 9))))
    // d3 has no query term -> omitted (sparse score), but still counted in N
  }

  test("saturation and length normalization move the score the right way") {
    val m = Bm25.bm25E4(docs, "doc_id", "text", Seq("a"))
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r._5).toMap
    // higher tf in a shorter doc must outscore lower tf in a longer doc
    assert(m(1L) > m(2L))

    // multi-term query: per-doc matched-term count, tf_sum, additivity
    val multi = Bm25.bm25E4(docs, "doc_id", "text", Seq("a", "c"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._5)).toMap
    assert(multi(2L)._1 == 2) // d2 matches both terms
    assert(multi(2L)._2 == 4) // tf_sum = tf(a)=1 + tf(c)=3
    assert(multi(1L)._1 == 1)
    assert(multi(2L)._3 > m(2L)) // adding a matched term only adds score
  }
}
