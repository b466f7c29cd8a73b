package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence preparation: the two ops between a deduped corpus
  * and a trainer's data loader (beyond the reference, like the rest of
  * the LLM-pipeline toolbox).
  *
  *  - [[packAssignments]]: concat-and-chunk sequence packing — assign
  *    every document a position in a fixed-token-budget training
  *    sequence, the standard pretraining shape (documents concatenated
  *    in a deterministic order, cut every `budget` tokens).
  *  - [[chunkByTokens]]: overlapping token-window chunking — split long
  *    documents into retrieval/context windows of `maxTokens` with
  *    `overlap` tokens of context carried between neighbours.
  *
  * Both are engine-portable (md5-ordered like [[Sampling]]) so results
  * are bit-stable across runs, engines, and partitionings.
  */
object SequencePrep {

  /** Pack documents into fixed-budget training sequences, shard-local.
    *
    * A single global concatenation order would need one global sort —
    * the anti-pattern at 100 TB. Instead documents are hash-bucketed
    * into `shards` independent streams (deterministic md5 buckets) and
    * concatenated within their shard in md5 order; each shard's stream
    * is cut every `budget` tokens. One window shuffle on the shard key,
    * every shard packs in parallel, and waste stays the same as the
    * global order (boundary cuts happen every `budget` tokens either
    * way). Returns one row per doc:
    * (id, shard, seq_id, seq_pos, crosses_boundary) where `seq_id` is
    * the sequence index within the shard, `seq_pos` the doc's first
    * token offset inside it, and `crosses_boundary` marks docs the
    * trainer will see split across two sequences.
    *
    * `lenCol` is the doc's token length — any integer cost column
    * works (chars for byte-budget packing). `carry` names extra input
    * columns to pass through unchanged (free inside the one window
    * shuffle — cheaper than a downstream re-join against the input,
    * which would recompute the whole upstream subtree). */
  def packAssignments(df: DataFrame, idCol: String, lenCol: String,
                      budget: Long, shards: Int,
                      carry: Seq[String] = Nil): DataFrame = {
    require(budget > 0 && shards > 0, s"budget/shards must be positive: $budget/$shards")
    val internal = Set("shard", "__len", "__end", "__start",
      "seq_id", "seq_pos", "crosses_boundary")
    require((carry :+ idCol).forall(c => !internal.contains(c)) && !carry.contains(idCol),
      s"carry/id must not collide with ${internal.mkString("/")} or repeat $idCol")
    val id = col(idCol)
    val shard = graft.functions.TextFunctions.md5Long(id.cast("string")) % shards
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5(id.cast("string")), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as(idCol) +: shard.as("shard") +:
        col(lenCol).cast("long").as("__len") +: carry.map(col): _*)
      .withColumn("__end", sum(col("__len")).over(w))
      .withColumn("__start", col("__end") - col("__len"))
      .select(col(idCol) +: carry.map(col) ++: Seq(
        col("shard"),
        // integer `div`, not double division: exact for any long shard
        // length (double division loses exactness past 2^53 tokens)
        expr(s"__start div ${budget}L").cast("long").as("seq_id"),
        (col("__start") % budget).as("seq_pos"),
        (((col("__start") % budget) + col("__len")) > budget)
          .as("crosses_boundary")): _*)
  }

  /** Split documents into overlapping windows of `maxTokens` whitespace
    * tokens, stepping `maxTokens - overlap` each time — the
    * retrieval-index / long-context chunking shape. Pure narrow op
    * (tokenize → window starts → explode → slice), no shuffle; chunk
    * membership is a function of the text alone. Docs shorter than one
    * window yield exactly one chunk; empty docs yield none; a tail
    * window whose tokens were all covered by the previous window
    * (`start + overlap >= n`) is dropped — every token still appears,
    * with no fully-redundant chunk (tokenizer-stride semantics). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got $overlap/$maxTokens")
    val step = maxTokens - overlap
    val toks: Column = graft.functions.TextFunctions.tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        explode(sequence(lit(0), size(col("__toks")) - 1, lit(step))).as("__start"),
        col("__toks"))
      .filter(col("__start") === 0 || col("__start") + overlap < size(col("__toks")))
      .select(col(idCol),
        (col("__start") / step).cast("long").as("chunk_idx"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(maxTokens)), " ").as("chunk_text"),
        least(size(col("__toks")) - col("__start"), lit(maxTokens)).cast("long")
          .as("n_chunk_tokens"))
  }
}
