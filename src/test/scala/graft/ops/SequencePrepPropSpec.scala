package graft.ops

import graft.SparkSpecBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the sequence-prep invariants a trainer depends
  * on: packing tiles every shard's stream exactly (no token gap or
  * overlap, every doc placed once) for arbitrary length distributions,
  * and chunking loses no token and duplicates none outside the declared
  * overlap, for arbitrary window geometry. Generators driven directly
  * (scalatest/scalacheck bridge not in the dependency set). */
class SequencePrepPropSpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (1 to n).flatMap(i => g.apply(params, Seed(i.toLong)))
  }

  private val packGen = for {
    nDocs <- Gen.choose(1, 300)
    budget <- Gen.oneOf(64L, 257L, 1024L)
    shards <- Gen.oneOf(1, 3, 8)
    lens <- Gen.listOfN(nDocs, Gen.frequency(
      (6, Gen.choose(1L, 50L)),   // typical short docs
      (2, Gen.choose(50L, 500L)),
      (1, Gen.choose(500L, 3000L)))) // docs spanning several sequences
  } yield (lens, budget, shards)

  test("packAssignments: every doc placed once, every shard stream tiles exactly") {
    samples(packGen, 15).foreach { case (lens, budget, shards) =>
      val docs = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "len")
      val out = SequencePrep.packAssignments(docs, "id", "len", budget, shards).collect()
      assert(out.length == lens.size) // one assignment per doc, none dropped
      val lenOf = lens.zipWithIndex.map { case (l, i) => i.toLong -> l }.toMap
      out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
        val stream = rows.sortBy(r => r.getAs[Long]("seq_id") * budget + r.getAs[Long]("seq_pos"))
        var expect = 0L
        stream.foreach { r =>
          val off = r.getAs[Long]("seq_id") * budget + r.getAs[Long]("seq_pos")
          assert(off == expect, s"stream gap/overlap (budget=$budget shards=$shards)")
          assert(r.getAs[Boolean]("crosses_boundary") ==
            (r.getAs[Long]("seq_pos") + lenOf(r.getAs[Long]("id")) > budget))
          expect = off + lenOf(r.getAs[Long]("id"))
        }
      }
    }
  }

  private val chunkGen = for {
    maxTokens <- Gen.choose(2, 16)
    overlap <- Gen.choose(0, maxTokens - 1)
    nToks <- Gen.choose(0, 60)
  } yield (maxTokens, overlap, nToks)

  test("chunkByTokens: overlap-stripped chunks reassemble the exact token stream") {
    samples(chunkGen, 25).foreach { case (maxTokens, overlap, nToks) =>
      val text = (1 to nToks).map(i => s"w$i").mkString(" ")
      val chunks = SequencePrep.chunkByTokens(
          Seq((1L, text)).toDF("id", "text"), "id", "text", maxTokens, overlap)
        .orderBy($"chunk_idx").collect()
      if (nToks == 0) assert(chunks.isEmpty)
      else {
        val rebuilt = chunks.zipWithIndex.flatMap { case (r, i) =>
          val toks = r.getAs[String]("chunk_text").split(" ").toSeq
          if (i == 0) toks else toks.drop(overlap)
        }.toSeq
        assert(rebuilt == text.split(" ").toSeq,
          s"lossy/duplicating chunking at max=$maxTokens ov=$overlap n=$nToks")
        // no chunk is fully redundant: each adds at least one new token
        chunks.zipWithIndex.drop(1).foreach { case (r, _) =>
          assert(r.getAs[Long]("n_chunk_tokens") > overlap ||
            chunks.length == 1)
        }
      }
    }
  }
}
