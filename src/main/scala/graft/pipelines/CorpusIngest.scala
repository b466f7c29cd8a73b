package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.hadoop.fs.Path
import graft.functions.TextFunctions
import graft.ops.Dedup
import graft.streaming.EventStream

/** Streaming corpus intake — the continuous ingest pipeline a
  * training-data platform runs in front of everything else in this
  * library (T-layer composition of gated operators):
  *
  *   1. quality gate ([[TextFunctions.isQuality]]) — narrow per-row
  *      filter, nothing low-quality ever enters state;
  *   2. in-flight exact dedup ([[EventStream.dedupDocumentsStream]]) —
  *      same-content arrivals within the watermark are dropped with
  *      bounded state (one fingerprint per unique doc in the window);
  *   3. per-batch reconciliation against the PERSISTENT fingerprint
  *      index ([[Dedup.incrementalNew]] in `foreachBatch`) — content
  *      that landed in ANY previous run is dropped; per-batch cost
  *      scales with the 16-byte/doc index, never the corpus;
  *   4. idempotent landing: survivors and their fingerprints are
  *      written to `batch=<id>` subdirectories with OVERWRITE — a
  *      retried micro-batch rewrites the same directories, so
  *      at-least-once execution still lands each batch exactly once
  *      (the standard file-sink batchId pattern). Readers get the
  *      accumulated corpus with `spark.read.parquet(corpusRoot)` and a
  *      free `batch` provenance column.
  *
  * At 100 TB: stages 1-2 are map-side + watermark-bounded state; stage
  * 3's anti-join broadcasts nothing corpus-sized (the index is compact
  * and grows with UNIQUE content only); stage 4 appends — no stage
  * rereads or shuffles the accumulated corpus, so per-batch cost is
  * independent of corpus age. */
object CorpusIngest {

  private val IndexSchema = StructType(Seq(StructField("fingerprint", StringType)))

  /** The stored fingerprint index (empty frame before first landing).
    * Reads only COMMITTED `batch=` directories (those carrying a
    * `_SUCCESS` marker — a crash mid-write leaves none, so a torn
    * directory can neither poison the read nor count as landed), and
    * excludes `excludeBatchId` when given: a replayed micro-batch must
    * NOT see its own first attempt's fingerprints, or the anti-join
    * would drop every replayed doc and the overwrite would erase the
    * previously landed data. */
  /** Committed `batch=` directories under a landing root. */
  private def committedBatchDirs(spark: SparkSession, rootDir: String,
                                 excludeBatchId: Option[Long]): Seq[String] = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .filter(s => excludeBatchId.forall(b => s.getPath.getName != s"batch=$b"))
      .map(_.getPath.toString)
  }

  def readIndex(spark: SparkSession, indexRoot: String,
                excludeBatchId: Option[Long] = None): DataFrame =
    committedBatchDirs(spark, indexRoot, excludeBatchId) match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], IndexSchema)
      case dirs => spark.read.parquet(dirs: _*).select("fingerprint")
    }

  /** The accumulated corpus, COMMITTED batches only — the symmetric
    * consumer-side read: a raw `spark.read.parquet(corpusRoot)` would
    * also pick up a torn directory from an in-flight or crashed batch.
    * Fails on an empty/absent root (there is no corpus to read yet —
    * the schema is the source's, unknown here). */
  def readCorpus(spark: SparkSession, corpusRoot: String): DataFrame = {
    val dirs = committedBatchDirs(spark, corpusRoot, None)
    require(dirs.nonEmpty, s"no committed batches under $corpusRoot")
    spark.read.parquet(dirs: _*)
  }

  /** Land one reconciled micro-batch idempotently (exposed for spec
    * replay tests). Returns the number of surviving docs. */
  def landBatch(batch: DataFrame, batchId: Long, corpusRoot: String,
                indexRoot: String, idCol: String, textCol: String): Long = {
    val spark = batch.sparkSession
    val keep = Dedup.incrementalNew(batch,
        readIndex(spark, indexRoot, excludeBatchId = Some(batchId)), idCol, textCol)
      .withColumnRenamed("doc_id", idCol)
    val survivors = batch.join(keep, Seq(idCol), "left_semi")
      .localCheckpoint() // one computation feeds both writes below
    survivors.write.mode(SaveMode.Overwrite).parquet(s"$corpusRoot/batch=$batchId")
    Dedup.fingerprints(survivors, textCol)
      .distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$indexRoot/batch=$batchId")
    survivors.count()
  }

  /** Start the intake over a streaming `source` (must contain idCol,
    * textCol, and an event-time tsCol). `AvailableNow` by default so a
    * scheduler can drain-and-stop; pass a processing-time trigger for
    * continuous intake. */
  def start(source: DataFrame, corpusRoot: String, indexRoot: String,
            checkpointDir: String, idCol: String, textCol: String, tsCol: String,
            watermarkDelay: String = "10 minutes",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val cleaned = EventStream.dedupDocumentsStream(
      source.filter(TextFunctions.isQuality(col(textCol))), textCol, tsCol, watermarkDelay)
    cleaned.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, batchId, corpusRoot, indexRoot, idCol, textCol): Unit
      }
      .start()
  }
}
