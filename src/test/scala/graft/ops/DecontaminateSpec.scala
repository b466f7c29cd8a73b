package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  private val benchText = "what is the capital of france paris is the capital of france"
  // doc 1 embeds a full benchmark sentence (contaminated); doc 2 shares
  // nothing 5-gram-long; doc 3 shares a 4-gram only (below n) — clean.
  private val corpus = Seq(
    (1L, "some filler text then what is the capital of france appears verbatim in this document"),
    (2L, "entirely unrelated prose about spark catalyst optimizer rules and physical execution plans"),
    (3L, "capital of france paris unrelated tail tokens here")
  ).toDF("doc_id", "text")
  private val bench = Seq((100L, benchText)).toDF("doc_id", "text")

  test("contamination flags only docs sharing a full n-gram with the bench set") {
    val out = Decontaminate.contamination(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList.sortBy(_._1)
    assert(out.map(_._1) == List(1L), s"only doc 1 is contaminated, got $out")
    // doc 1 contains "what is the capital of france" = two distinct 5-grams
    val (_, hits, total) = out.head
    assert(hits == 2, s"expected 2 shared 5-grams, got $hits")
    assert(total == 11, s"doc 1 has 15 tokens -> 11 distinct 5-grams, got $total")
  }

  test("contamination of disjoint corpora is empty") {
    val out = Decontaminate.contamination(
      corpus.filter(col("doc_id") =!= 1), bench, "doc_id", "text", n = 5)
    assert(out.isEmpty)
  }
}
