package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) — hashed n-gram importance weights for steering a
  * raw corpus toward a target distribution, integer-exact so the
  * weights are engine-portable.
  *
  * The published method scores each raw document by
  * Σ log(p_target(feature) / p_raw(feature)) over hashed n-gram
  * features. Here the per-bucket ratio is kept as an add-one-smoothed
  * integer quantum w(b) = (10^6 · (tgt(b)+1)) div (raw(b)+1) — order
  * statistics over the scores (which is all resampling consumes) are
  * preserved under any monotone transform, and the arithmetic carries
  * no transcendentals (q112 discipline).
  *
  * Scale shape — the reason hashed features are THE production choice:
  * the feature space is a FIXED number of buckets (default 4096), so
  * the trained weight table is O(buckets) regardless of corpus size and
  * always broadcasts. Token text leaves the map stage only as (id,
  * bucket, cnt) rows; the raw corpus is scored with one hash agg + one
  * broadcast join + one hash agg. Target and raw bucket counts are two
  * independent map-side-combined aggs.
  */
object Dsir {

  /** Portable hashed feature bucket for a token: md5-long mod buckets
    * (the q54/q74 hash family — bytes-defined in every engine). */
  def featureBucket(token: Column, buckets: Int): Column =
    TF.md5Long(token) % buckets

  /** (id, bucket, cnt): per-document hashed-unigram bucket counts.
    * Same `\s+`+lower tokenization as the rest of the text family. */
  def docBuckets(docs: DataFrame, idCol: String, textCol: String,
                 buckets: Int): DataFrame =
    // spread before the tokenize+explode — the dominant map — else a
    // single-file corpus runs it on 1–2 tasks (r16 dissection: two
    // such stages carried 17 of q126's 10.6 s; the ensureParallelism
    // rule, no-op on multi-split sources)
    Dedup.ensureParallelism(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(expr(s"filter(split(lower(${textCol}), '\\\\s+'), t -> length(t) > 0)"))
          .as("tok"))
      .select(col(idCol), featureBucket(col("tok"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  private def weightsFromCounts(rawCnt: DataFrame, tgtCnt: DataFrame): DataFrame =
    rawCnt.join(tgtCnt, Seq("bucket"), "left")
      .withColumn("tgt_cnt", coalesce(col("tgt_cnt"), lit(0L)))
      .withColumn("w", expr("(1000000 * (tgt_cnt + 1)) div (raw_cnt + 1)"))

  /** The weight table: every bucket seen in the RAW corpus, with
    * add-one-smoothed target/raw ratio quanta. O(buckets) rows. */
  def bucketWeights(raw: DataFrame, target: DataFrame, idCol: String,
                    textCol: String, buckets: Int): DataFrame =
    weightsFromCounts(
      docBuckets(raw, idCol, textCol, buckets)
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("raw_cnt")),
      docBuckets(target, idCol, textCol, buckets)
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("tgt_cnt")))

  /** Score every raw document: (id, n_tokens, imp_sum, avg_imp).
    * imp_sum = Σ cnt(b)·w(b) over the doc's buckets; avg_imp is the
    * per-token quantum (integer div). Empty documents drop (no tokens,
    * no score). The weight table rides a broadcast join, and the raw
    * corpus is tokenized ONCE: the per-(doc,bucket) frame feeds both
    * the raw bucket totals and the scoring join from the same lineage,
    * so AQE reuses its shuffle instead of re-exploding the text. */
  def scoreDocs(raw: DataFrame, target: DataFrame, idCol: String,
                textCol: String, buckets: Int = 4096): DataFrame = {
    val db = docBuckets(raw, idCol, textCol, buckets)
    val weights = weightsFromCounts(
        db.groupBy(col("bucket")).agg(sum(col("cnt")).as("raw_cnt")),
        docBuckets(target, idCol, textCol, buckets)
          .groupBy(col("bucket")).agg(sum(col("cnt")).as("tgt_cnt")))
      .select(col("bucket"), col("w"))
    db.join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("w")).as("imp_sum"))
      .withColumn("avg_imp", expr("imp_sum div n_tokens"))
  }
}
