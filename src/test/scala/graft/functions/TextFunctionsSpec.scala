package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokenCount counts \\S+ runs") {
    val out = one("  the quick  brown\tfox \n jumps ").select(TextFunctions.tokenCount($"text")).head().getInt(0)
    assert(out == 5)
  }

  test("bpeTokens splits contractions, letter/digit/punct runs, keeps space prefixes") {
    val toks = one("We don't have 42 apples, okay?")
      .select(TextFunctions.bpeTokens($"text")).head().getSeq[String](0)
    assert(toks == Seq("We", " don", "'t", " have", " 42", " apples", ",", " okay", "?"))
    val n = one("We don't have 42 apples, okay?")
      .select(TextFunctions.bpeTokenCount($"text")).head().getInt(0)
    assert(n == toks.length)
  }

  test("stopwordCount is word-bounded (no substring hits)") {
    // "theory" must not count as "the"; "is" inside "island" must not count
    val out = one("theory island the is on").select(TextFunctions.stopwordCount($"text")).head().getInt(0)
    assert(out == 3)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq(("a", "The  Quick Fox"), ("b", "the quick fox"), ("c", "the quick foxes"))
      .toDF("id", "text")
    val fps = df.select($"id", TextFunctions.fingerprint($"text").as("fp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("scrubPii redacts emails, phones, IPv4 with typed placeholders") {
    val in = "mail bob.smith+x@example.co.uk or call +1 (555) 123-4567; host 10.0.0.1 ok"
    val out = one(in).select(TextFunctions.scrubPii($"text")).head().getString(0)
    assert(out == "mail <EMAIL> or call <PHONE>; host <IP> ok")
    // counts audit the same patterns
    val (e, i, p) = TextFunctions.piiCounts($"text")
    val row = one(in).select(e.as("e"), i.as("i"), p.as("p")).head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((1, 1, 1)))
    // clean text passes through untouched
    val clean = "no personal data in this sentence"
    assert(one(clean).select(TextFunctions.scrubPii($"text")).head().getString(0) == clean)

    // no double-booking: an all-digit email local part is ONE email,
    // not also a phone (counts audit the sequentially-scrubbed forms)
    val tricky = "ping 12345678901@example.com now"
    assert(one(tricky).select(TextFunctions.scrubPii($"text")).head().getString(0)
      == "ping <EMAIL> now")
    val (e2, i2, p2) = TextFunctions.piiCounts($"text")
    val r2 = one(tricky).select(e2.as("e"), i2.as("i"), p2.as("p")).head()
    assert((r2.getInt(0), r2.getInt(1), r2.getInt(2)) == ((1, 0, 0)))
  }

  test("langGuess picks marker-dominant language, und when nothing matches") {
    val df = Seq(
      (1, "the cat and the dog is happy"),
      (2, "der hund und die katze ist nicht da"),
      (3, "le chat et les chiens des villes"),
      (4, "el gato y los perros que corren"),
      (5, "xyzzy plugh qwerty")).toDF("id", "text")
    val out = df.select($"id", TextFunctions.langGuess($"text").as("g"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "en"); assert(out(2) == "de")
    assert(out(3) == "fr"); assert(out(4) == "es"); assert(out(5) == "und")
  }

  test("shingles produces n-grams in order; short docs give empty array") {
    val out = one("a b c d").select(TextFunctions.shingles($"text", 3).as("s"))
      .head().getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
    val short = one("a b").select(TextFunctions.shingles($"text", 3).as("s")).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("rollingHash is deterministic and order-sensitive") {
    val h = (t: String) => one(t).select(TextFunctions.rollingHash($"text")).head().getLong(0)
    assert(h("a b c") == h("a b c"))
    assert(h("a b c") != h("c b a"))
    assert(h("a b c") >= 0 && h("a b c") < 2147483647L)
  }

  test("isQuality gates on token count and stopword ratio") {
    val good = "the cat sat on the mat and it was a good day for everyone involved"
    val short = "tiny doc"
    val noStops = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " * 10
    val df = Seq((1, good), (2, short), (3, noStops)).toDF("id", "text")
    val out = df.select($"id", TextFunctions.isQuality($"text").as("q"))
      .collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(out(1)); assert(!out(2)); assert(!out(3))
  }
}
