package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Md5WindowLongExpr]] (the digest-bytes kernel behind
  * [[TextFunctions.md5Long]] since the r17 optimization round)
  * bit-identical to the original Column-chain derivation
  * `conv(substring(md5(c), s, 15), 16, 10).cast("long")` — the exact
  * form every oracle reproduces in SQL — across the input domain the
  * engine feeds it: ASCII, unicode (composed and astral), empty
  * strings, nulls, numeric casts, and every startDigit a call site
  * uses (1; 16 and 17 for the independent-window family). */
class Md5WindowSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val inputs: Seq[String] = Seq(
    "", "a", "spark", "hash join", "0", "-123", "9000042", "3.14",
    "the quick brown fox jumps over the lazy dog",
    "café", "café", "日本語", "😀emoji",
    "line\nbreak\ttab", "trailing space ", " leading",
    "x" * 500, ("shingle:" * 40) + "tail", "NULL", "null"
  ) ++ (0 until 64).map(i => s"doc-$i:token-${i * 37}")

  test("kernel == hex-chain for every used startDigit, incl nulls") {
    val df = (inputs.map(Option(_)) :+ None).toDF("s")
    for (sd <- Seq(1, 2, 16, 17, 18)) {
      val rows = df.select(
        TextFunctions.md5Long(col("s"), sd).as("kernel"),
        TextFunctions.md5LongChain(col("s"), sd).as("chain")).collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch at row $i sd=$sd")
        if (!r.isNullAt(0))
          assert(r.getLong(0) === r.getLong(1),
            s"value mismatch at row $i sd=$sd: kernel=${r.getLong(0)} chain=${r.getLong(1)}")
      }
    }
  }

  test("kernel matches chain on numeric key casts (the sampling shape)") {
    val df = spark.range(0, 2000).select(col("id").cast("string").as("s"))
    val bad = df.select(
      TextFunctions.md5Long(col("s")).as("k"),
      TextFunctions.md5LongChain(col("s")).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(bad === 0L)
  }

  test("non-string input implicit-casts like the old chain (r17 advice)") {
    // the conv(substring(md5(c))) chain accepted implicitly-castable
    // inputs; ImplicitCastInputTypes keeps that tolerance — a bare
    // long column analyzes and hashes as its string form
    val df = spark.range(0, 500)
    val bad = df.select(
      TextFunctions.md5Long(col("id")).as("k"),
      TextFunctions.md5LongChain(col("id").cast("string")).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(bad === 0L)
  }

  test("window stays in 60-bit unsigned range") {
    val mx = spark.range(0, 5000).select(col("id").cast("string").as("s"))
      .select(TextFunctions.md5Long(col("s")).as("k"))
      .agg(max(col("k")), min(col("k"))).collect()(0)
    assert(mx.getLong(1) >= 0L && mx.getLong(0) < (1L << 60))
  }
}
