package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Release-to-release corpus drift audit: given two snapshots of a
  * document table, classify every id as added / removed / changed /
  * unchanged by content fingerprint, and roll the classification up
  * per dimension (source, language, ...) for the release report. The
  * bread-and-butter check before shipping a training-data refresh:
  * "what actually moved since the last cut, and from where?"
  *
  * Fingerprints are md5 over the raw text — bytes-defined (engine- and
  * run-portable, the q24 discipline), and the only thing that crosses
  * the wire: the full-outer join keys (id, 32-hex fp) rows, never the
  * document bodies. One hash shuffle per side; at 100 TB both sides
  * partition on id and AQE handles the skewless merge. For snapshots
  * stored bucketed by id the exchange disappears entirely
  * ([[Bucketing]]).
  */
object CorpusDiff {

  /** Per-document classification: (id, status, fp_prev, fp_cur) with
    * status in added | removed | changed | unchanged. `added` = in
    * `cur` only, `removed` = in `prev` only, `changed` = in both with
    * differing fingerprints. */
  def diff(prev: DataFrame, cur: DataFrame, idCol: String, textCol: String): DataFrame = {
    val p = prev.select(col(idCol).as("id"), md5(col(textCol)).as("fp_prev"))
    val c = cur.select(col(idCol).as("id"), md5(col(textCol)).as("fp_cur"))
    p.join(c, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp_prev").isNull, lit("added"))
          .when(col("fp_cur").isNull, lit("removed"))
          .when(col("fp_prev") =!= col("fp_cur"), lit("changed"))
          .otherwise(lit("unchanged")))
  }

  /** Drift rows only (added/removed/changed), for downstream triage. */
  def drift(prev: DataFrame, cur: DataFrame, idCol: String, textCol: String): DataFrame =
    diff(prev, cur, idCol, textCol)
      .filter(col("status") =!= "unchanged")
      .select(col("id"), col("status"))

  /** Per-dimension rollup: join the classification back to whichever
    * snapshot still has the doc (cur for added/changed/unchanged, prev
    * for removed) and count per (dimension values, status). One extra
    * hash aggregate; dims are small carried columns, not text. */
  def summaryBy(prev: DataFrame, cur: DataFrame, idCol: String, textCol: String,
                dims: Seq[String]): DataFrame = {
    val d = diff(prev, cur, idCol, textCol).select(col("id"), col("status"))
    // deterministic dim attribution: cur's values win where the doc is
    // in both snapshots (a changed doc reports under its NEW dims)
    val dimSide = cur.select(col(idCol).as("id"), struct(dims.map(col): _*).as("__dc"))
      .join(prev.select(col(idCol).as("id"), struct(dims.map(col): _*).as("__dp")),
        Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("__dc"), col("__dp")).as("__d"))
    d.join(dimSide, Seq("id"), "left")
      .groupBy(col("status") +: dims.map(n => col(s"__d.$n").as(n)): _*)
      .agg(count(lit(1)).as("n_docs"))
  }
}
