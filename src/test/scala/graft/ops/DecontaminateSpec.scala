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

  test("bloomContamination is a superset of exact contamination") {
    // at a roomy m the filter has no room for false positives on this
    // fixture, so the report must equal the exact one bit-for-bit
    val exact = Decontaminate.contamination(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Decontaminate.bloomContamination(corpus, bench, "doc_id", "text",
        n = 5, mBits = 1 << 22, kHashes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
  }

  test("bloomContamination at tiny m produces false positives, never false negatives") {
    // m=8 with 3 probes over ~11 bench grams saturates the filter:
    // every corpus gram is flagged — the degenerate-but-correct bound
    val bloom = Decontaminate.bloomContamination(corpus, bench, "doc_id", "text",
        n = 5, mBits = 8, kHashes = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exactHits = Map(1L -> 2L)
    // no false negatives: every exactly-contaminated doc at least as flagged
    exactHits.foreach { case (id, hits) =>
      assert(bloom.contains(id) && bloom(id)._1 >= hits, s"doc $id under-flagged: $bloom")
    }
    // false positives exist (clean docs flagged) and are bounded by the
    // doc's own distinct-gram count
    assert(bloom.keySet.exists(id => !exactHits.contains(id)), s"expected FPs at m=8: $bloom")
    bloom.foreach { case (id, (flagged, shingles)) =>
      assert(flagged <= shingles, s"doc $id flagged=$flagged > shingles=$shingles")
    }
  }

  test("bloomContamination is deterministic across repartitionings") {
    val a = Decontaminate.bloomContamination(corpus, bench, "doc_id", "text",
      n = 5, mBits = 1 << 10, kHashes = 3).collect().map(_.toSeq).toSet
    val b = Decontaminate.bloomContamination(corpus.repartition(7), bench.coalesce(1),
      "doc_id", "text", n = 5, mBits = 1 << 10, kHashes = 3).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
