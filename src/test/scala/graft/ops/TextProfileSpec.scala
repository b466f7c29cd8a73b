package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("repetitionSignals: token/bigram counts, highly-repetitive doc flagged") {
    val df = Seq(
      (1L, "a b a b a b"),          // 6 tokens, 2 distinct; bigrams: "a b"x3, "b a"x2
      (2L, "all words here differ"), // no repetition: top bigram 1
      (3L, "one"),                   // single token: zero bigrams
      (4L, "")                       // empty: zero tokens, zero bigrams
    ).toDF("doc_id", "text")
    val out = TextProfile.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap

    assert(out(1L) == ((6, 2, 5, 3)))  // n_tokens, n_distinct, n_bigrams, top_bigram_n
    assert(out(2L) == ((4, 4, 3, 1)))
    assert(out(3L) == ((1, 1, 0, 0)))
    assert(out(4L) == ((0, 0, 0, 0)))

    // the Gopher-style signal consumers derive: doc 1 is repetitive
    // (top bigram 3/5 > half), doc 2 is not
    assert(out(1L)._4 * 2 > out(1L)._3)
    assert(out(2L)._4 * 2 < out(2L)._3)
  }

  test("sourceStats: per-source mass, token mean, and exact-dup rate") {
    val df = Seq(
      ("web", "same text"), ("web", "same text"), ("web", "other words here"),
      ("book", "unique one"), ("book", "unique two")
    ).toDF("source", "text")
    val out = TextProfile.sourceStats(df, "text", "source")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
          r.getAs[Double]("mean_tokens"), r.getAs[Long]("n_unique"),
          r.getAs[Double]("dup_rate")))).toMap
    // web: 3 docs, two identical -> 2 unique, dup_rate 1/3;
    // chars 9+9+16=34; tokens 2+2+3=7 -> mean 7/3
    assert(out("web") == ((3L, 34L, 7.0 / 3, 2L, 1.0 - 2.0 / 3)))
    assert(out("book") == ((2L, 20L, 2.0, 2L, 0.0)))
  }

  test("gopherRules: each rule trips on its own violation, clean doc passes") {
    val clean = ("the data and the model have that shape with more " * 6).trim
    val docs = Seq(
      (1L, clean),                                   // all rules pass
      (2L, "the and of to be"),                      // too few words
      (3L, ("a b c " * 20).trim + " the and"),       // mean word length < 3
      (4L, (("### " * 30) + clean)),                 // symbol ratio > 0.1
      (5L, (1 to 10).map(i => s"- item the and of with $i").mkString("\n")), // all lines bulleted
      (6L, (1 to 10).map(i => s"line the and of with $i...").mkString("\n")), // all lines ellipsis-ended
      (7L, ("123 456 789 0 1 2 3 4 5 6 " * 6).trim + " the and"), // < 80% alphabetic words
      (8L, ("lorem ipsum dolor sit amet foo bar baz qux quux " * 6).trim)) // < 2 stopwords
      .toDF("doc_id", "text")
    val out = TextProfile.gopherRules(docs, "doc_id", "text", minWords = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))).toMap
    assert(out(1L) == ((true, true, true, true, true, true, true, true)), "clean")
    assert(!out(2L)._1 && !out(2L)._8, "word count")
    assert(!out(3L)._2 && !out(3L)._8, "mean word length")
    assert(!out(4L)._3 && !out(4L)._8, "symbol ratio")
    assert(!out(5L)._4 && !out(5L)._8, "bullet lines")
    assert(!out(6L)._5 && !out(6L)._8, "ellipsis lines")
    assert(!out(7L)._6 && !out(7L)._8, "alpha words")
    assert(!out(8L)._7 && !out(8L)._8, "stopwords")
  }

  test("gopherRules: CRLF text counts line rules like LF text") {
    val lf = (1 to 10).map(i => s"line the and of with $i...").mkString("\n")
    val crlf = lf.replace("\n", "\r\n")
    val out = TextProfile.gopherRules(
      Seq((1L, lf), (2L, crlf)).toDF("doc_id", "text"), "doc_id", "text",
      minWords = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), (2 to 9).map(r.getBoolean))).toMap
    assert(out(1L) == out(2L), "CR must not change any census")
    assert(!out(1L)._2(4), "all lines ellipsis-ended trips the rule")
  }

  test("hashedFeatures: signed sums match a replica; repeats add; zeros drop") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb aa aa"), (2L, "cc"), (3L, "")).toDF("doc_id", "text")
    def h(tok: String, start: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(start - 1, start - 1 + 15), 16)
    }
    def expect(toks: Seq[String], d: Int): Map[Int, Long] =
      toks.groupBy(t => (h(t, 1) % d).toInt).view.mapValues(_.map(t =>
        if (h(t, 17) % 2 == 0) 1L else -1L).sum).toMap.filter(_._2 != 0L)
    val got = TextProfile.hashedFeatures(docs.repartition(5), "doc_id", "text", d = 16)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getInt(1) -> r.getLong(2)).toMap).toMap
    assert(got.getOrElse(1L, Map.empty) == expect(Seq("aa", "bb", "aa", "aa"), 16))
    assert(got.getOrElse(2L, Map.empty) == expect(Seq("cc"), 16))
    assert(!got.contains(3L)) // empty doc -> no rows
  }

  test("oovProfile: exact per-doc counts, empty docs omitted, duplicate vocab harmless") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb cc aa"),    // bb cc oov → 2/4
      (2L, "aa aa aa"),       // 0/3
      (3L, "zz yy"),          // 2/2
      (4L, "")                // no tokens → no row
    ).toDF("doc_id", "text")
    val vocab = Seq("aa", "aa", "dd").toDF("value") // dup + unused entries
    val got = TextProfile.oovProfile(docs, "doc_id", "text", vocab, "value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((4L, 2L, 500000L)),
      2L -> ((3L, 0L, 0L)),
      3L -> ((2L, 2L, 1000000L))))
  }
}
