package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) of a dirty feed against a clean
  * master: multi-pass BLOCKING to generate candidates, edit-distance
  * verification, best-match selection — the Fellegi–Sunter pipeline
  * shape with deterministic arithmetic throughout (levenshtein is
  * exact; the winner is argmin by (distance, master id)).
  *
  * Blocking is the scale lever (the q26 inverted-index discipline
  * applied to linkage): never all-pairs — candidates come from the
  * UNION of equi-joins on cheap keys (here name prefix and suffix,
  * so a single-character corruption anywhere still shares at least
  * one key with its source unless it hits both ends). Each pass is a
  * plain key join that AQE broadcasts when the master is
  * dimension-sized and skew-splits on hot blocks; the quadratic
  * verify runs per block, never per corpus.
  */
object EntityMatch {

  /** Best master match per feed record within `maxDist` edits:
    * (feedId, masterId, dist). Feed records with no candidate within
    * the threshold are absent (callers left-join if they need the
    * unmatched set). Null names/ids drop.
    *
    * Recall contract: for names of at least 2·blockChars characters, a
    * single corruption leaves the prefix or the suffix key intact
    * (they don't overlap). SHORTER names get first/last-CHARACTER
    * blocks instead (an interior edit keeps both, an end edit keeps
    * the other) — without this the prefix and suffix overlap and one
    * interior deletion can shift both 3-char keys at once. */
  def linkRecords(feed: DataFrame, feedId: String, feedName: String,
                  master: DataFrame, masterId: String, masterName: String,
                  maxDist: Int = 2, blockChars: Int = 3,
                  maxBlockRows: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 0 && blockChars >= 1 && maxBlockRows >= 1,
      s"need maxDist >= 0, blockChars >= 1, maxBlockRows >= 1: " +
        s"$maxDist/$blockChars/$maxBlockRows")
    require(feedId != masterId && feedId != "dist" && masterId != "dist",
      s"output columns must be distinct: $feedId/$masterId/dist")
    val f = feed.select(col(feedId).as("__fid"), col(feedName).as("__fname"))
      .filter(col("__fid").isNotNull && col("__fname").isNotNull)
    val m = master.select(col(masterId).as("__mid"), col(masterName).as("__mname"))
      .filter(col("__mid").isNotNull && col("__mname").isNotNull)
    val short = (c: org.apache.spark.sql.Column) => length(c) < 2 * blockChars
    // the df-cap discipline (jaccardPairs / BasketEdges): a key shared
    // by more than maxBlockRows master rows generates a quadratic
    // candidate blow-up at a hot block — drop the key (recall falls
    // back to the other passes), as a real-vocabulary master only hits
    // this on degenerate keys. The gate leaves the cap off (fixture
    // blocks are small); callers set it at production scale.
    def blocked(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                onlyShort: Boolean) = {
      val fs = if (onlyShort) f.filter(short(col("__fname"))) else f
      val ms0 = if (onlyShort) m.filter(short(col("__mname"))) else m
      val msk = ms0.withColumn("__k", key(col("__mname")))
      val ms =
        if (maxBlockRows == Int.MaxValue) msk
        else msk.join(
          msk.groupBy(col("__k")).agg(count(lit(1)).as("__bn"))
            .filter(col("__bn") <= maxBlockRows).select(col("__k")),
          "__k")
      fs.withColumn("__k", key(col("__fname")))
        .join(ms, "__k")
        .select(col("__fid"), col("__fname"), col("__mid"), col("__mname"))
    }
    val cands = blocked(substring(_, 1, blockChars), onlyShort = false)
      .union(blocked(substring(_, -blockChars, blockChars), onlyShort = false))
      .union(blocked(substring(_, 1, 1), onlyShort = true))
      .union(blocked(substring(_, -1, 1), onlyShort = true))
      .distinct()
    val w = Window.partitionBy(col("__fid"))
      .orderBy(col("dist").asc, col("__mid").asc)
    cands
      .withColumn("dist", levenshtein(col("__fname"), col("__mname")))
      .filter(col("dist") <= maxDist)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__fid").as(feedId), col("__mid").as(masterId), col("dist"))
  }
}
