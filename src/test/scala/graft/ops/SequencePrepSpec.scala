package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SequencePrepSpec extends SparkSpecBase {
  import spark.implicits._

  test("packAssignments: offsets tile each shard's stream exactly, budget cuts marked") {
    val docs = (1L to 200L).map(i => (i, 100L + (i % 7) * 50)).toDF("id", "len")
    val packed = SequencePrep.packAssignments(docs, "id", "len", budget = 512L, shards = 4)
      .collect()
    assert(packed.length == 200)

    val byShard = packed.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    val lens = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((_, rows) <- byShard) {
      // reconstruct the shard stream: global offset = seq_id*budget + seq_pos
      // must tile the concatenation with no gaps or overlaps
      val sorted = rows.sortBy(r => r.getAs[Long]("seq_id") * 512 + r.getAs[Long]("seq_pos"))
      var expect = 0L
      for (r <- sorted) {
        val off = r.getAs[Long]("seq_id") * 512 + r.getAs[Long]("seq_pos")
        assert(off == expect, s"gap/overlap at doc ${r.getAs[Long]("id")}")
        val len = lens(r.getAs[Long]("id"))
        assert(r.getAs[Boolean]("crosses_boundary") ==
          (r.getAs[Long]("seq_pos") + len > 512))
        expect = off + len
      }
    }
  }

  test("packAssignments is partition-invariant (same assignment after repartition)") {
    val docs = (1L to 100L).map(i => (i, 64L + i % 13)).toDF("id", "len")
    val a = SequencePrep.packAssignments(docs, "id", "len", 256L, 4)
      .collect().map(r => r.toSeq).toSet
    val b = SequencePrep.packAssignments(docs.repartition(13), "id", "len", 256L, 4)
      .collect().map(r => r.toSeq).toSet
    assert(a == b)
  }

  test("chunkByTokens: overlap carried, short docs one chunk, empty docs none") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, window 4 step 2
      (2L, "only three tokens"),
      (3L, "")).toDF("id", "text")
    val chunks = SequencePrep.chunkByTokens(docs, "id", "text", maxTokens = 4, overlap = 2)
      .orderBy($"id", $"chunk_idx").collect()

    val d1 = chunks.filter(_.getLong(0) == 1L)
    // starts 0,2,4,6 (8 dropped: its tokens t9,t10 are already covered
    // by the window at 6) — consecutive pairs share the 2-token overlap
    assert(d1.length == 4)
    assert(d1.head.getAs[String]("chunk_text") == "t1 t2 t3 t4")
    assert(d1(1).getAs[String]("chunk_text") == "t3 t4 t5 t6")
    assert(d1.last.getAs[String]("chunk_text") == "t7 t8 t9 t10")
    assert(d1.last.getAs[Long]("n_chunk_tokens") == 4L)

    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getAs[String]("chunk_text") == "only three tokens")
    assert(!chunks.exists(_.getLong(0) == 3L)) // empty doc -> no chunks
  }

  test("chunkByTokens reassembles the document when overlap is stripped") {
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val chunks = SequencePrep.chunkByTokens(Seq((7L, text)).toDF("id", "text"), "id", "text",
      maxTokens = 8, overlap = 3)
      .orderBy($"chunk_idx").collect()
    // dropping each chunk's leading `overlap` tokens (except the first)
    // and concatenating reproduces the original token stream's prefix
    // relation: every token appears at its original position
    val rebuilt = chunks.zipWithIndex.flatMap { case (r, i) =>
      val toks = r.getAs[String]("chunk_text").split(" ").toSeq
      if (i == 0) toks else toks.drop(3)
    }.toSeq
    assert(rebuilt == text.split(" ").toSeq)
  }
}
