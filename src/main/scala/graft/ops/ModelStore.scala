package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PqModel

/** Persistence for trained search models — the seam that turns the
  * ANN stack from "train per job" into "train once, serve everywhere".
  *
  * At 100 TB a PQ codebook or coarse-quantizer centroid table is
  * trained on one scheduled pipeline and consumed by every search job
  * thereafter (the in-JVM cache the gates share is session-local; a
  * cluster needs an artifact). Models are tiny relations, so they ride
  * the SAME atomic-publish machinery as data tables
  * ([[ManifestSwap]]): a new training run publishes a new generation
  * behind an atomically-renamed manifest pointer — readers never see a
  * half-written codebook, rollback is [[ManifestSwap.readAt]], and a
  * degenerate training output can be refused upstream before publish.
  *
  * The PQ round trip is EXACT: `PqModel` is integer-exact by
  * construction (e6-quantized centroid components), so save → load
  * reconstructs the model bit-for-bit and codes produced by the
  * reloaded model are identical to the original's (spec-pinned).
  * Centroid tables ([[graft.functions.VectorFunctions.centroidsByLabel]]
  * / `kmeansCentroids` output) are already DataFrames and publish
  * as-is. */
object ModelStore {

  /** A PqModel as a flat relation: one row per codebook entry,
    * (m, subDim, s, code, cv) — the shape rides every row so the
    * relation is self-describing (and a manifest diff of two
    * generations is a plain row diff). */
  def pqToDf(spark: SparkSession, model: PqModel): DataFrame = {
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.map { case (code, cv) => (model.m, model.subDim, s, code, cv) }
    }.toDF("m", "sub_dim", "s", "code", "cv")
  }

  /** Reconstruct the exact PqModel from [[pqToDf]]'s relation.
    * Codebooks come back indexed by subspace with entries in code
    * order — the constructor shape `train` produces. Fails loudly on
    * an inconsistent relation (mixed shapes, duplicate codes). */
  def pqFromDf(df: DataFrame): PqModel = {
    val rows = df.select(col("m"), col("sub_dim"), col("s"), col("code"), col("cv"))
      .collect()
    require(rows.nonEmpty, "empty model relation")
    val shapes = rows.map(r => (r.getInt(0), r.getInt(1))).distinct
    require(shapes.length == 1, s"mixed model shapes: ${shapes.mkString(",")}")
    val (m, subDim) = shapes.head
    val bySub = rows.groupBy(_.getInt(2))
    // every declared subspace must actually have entries — without this
    // a missing subspace would silently become an empty codebook and
    // the structurally-broken model would only fail at encode time
    require(bySub.keySet == (0 until m).toSet,
      s"model relation covers subspaces ${bySub.keySet.toSeq.sorted.mkString(",")}, expected 0..${m - 1}")
    val codebooks = IndexedSeq.tabulate(m) { s =>
      val entries = bySub.getOrElse(s, Array.empty).map { r =>
        (r.getInt(3), r.getSeq[Long](4).toIndexedSeq)
      }.sortBy(_._1).toIndexedSeq
      require(entries.map(_._1).distinct.length == entries.length,
        s"duplicate codes in subspace $s")
      entries
    }
    PqModel(m, subDim, codebooks)
  }

  /** Publish a trained PQ model as the named artifact's next
    * generation (atomic, versioned, retained — the [[ManifestSwap]]
    * contract). Returns the publish outcome map. */
  def publishPqModel(spark: SparkSession, root: String, name: String,
                     model: PqModel): Map[String, Boolean] =
    ManifestSwap.publish(spark, root, Map(name -> pqToDf(spark, model)))

  /** The current generation of a published PQ model. */
  def loadPqModel(spark: SparkSession, root: String, name: String): PqModel =
    pqFromDf(ManifestSwap.read(spark, root, name))

  /** Publish a centroid relation (label/bucket quantizer) next to the
    * PQ codebooks — one atomic manifest can carry both, so a search
    * tier never mixes a new coarse quantizer with old codebooks. */
  def publishModels(spark: SparkSession, root: String,
                    pq: Map[String, PqModel],
                    relations: Map[String, DataFrame] = Map.empty): Map[String, Boolean] =
    ManifestSwap.publish(spark, root,
      pq.map { case (n, mo) => n -> pqToDf(spark, mo) } ++ relations)
}
