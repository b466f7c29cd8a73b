package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation community detection (Raghavan et al.
  * 2007), made deterministic: every node starts as its own label, and
  * each round every node adopts the most frequent label among its
  * neighbors with ties broken by SMALLEST label — the synchronous
  * variant with a total tie order, so the result after a fixed number
  * of rounds is bit-identical on any engine (async/random-order LPA,
  * the common formulation, is not gateable).
  *
  * Fixed iterations rather than convergence: synchronous LPA can
  * oscillate on bipartite-ish structures, so production runs cap
  * rounds anyway (GraphFrames does the same); the caller picks the
  * budget and the gate pins the exact state after k rounds.
  *
  * Scale shape, per round: one join edges⋈labels on the neighbor id
  * (labels are |V| rows — AQE broadcasts them when they fit, else a
  * co-partitioned shuffle), one (node, label) hash agg with map-side
  * combine, then the per-node argmax as a SECOND hash agg —
  * max(struct(n, −label)) encodes "most frequent, tie to smallest
  * label" in one struct comparison, so no per-round window sort ever
  * runs (a row_number argmax costs a full sort of the (node, label)
  * table every round; the struct-max partial-aggregates map-side).
  * Label lineage cut each round (`materialize`), the q93 PageRank
  * discipline. */
object LabelProp {

  /** (id, label) after `iterations` synchronous rounds over the
    * UNDIRECTED graph of `edges0`. By default both directions are
    * added and self-loops/duplicates dropped; pass
    * `assumeSymmetric = true` when the input already satisfies that
    * contract (e.g. [[BasketEdges.edges]]) to skip the redundant
    * symmetrize+distinct shuffle. */
  def labelPropagation(edges0: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int, assumeSymmetric: Boolean = false,
                       materialize: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // every intermediate (edge materializations, per-round label
    // checkpoints) is released on exit; only the returned frame stays
    // persisted, self-contained behind one final cut (r15 advice —
    // the partitioned edge checkpoint used to leak per call)
    CacheHygiene.scoped(edges0.sparkSession) {
    // guarded rename: a redundant self-alias here would erase the
    // capture's recorded partitioning ([[ShuffleSizing.renameForCapture]])
    val dir = ShuffleSizing.renameForCapture(edges0, srcCol, "src", dstCol, "dst")
    // r18: flat-cut before the symmetrize union — its two branches
    // otherwise re-execute the caller's edge plan twice (the CC/BFS
    // double-read finding; blocks released by the hygiene scope)
    val sym =
      if (assumeSymmetric) dir
      else {
        val d0 = materialize(dir)
        d0.union(d0.select(col("dst").as("src"), col("src").as("dst")))
          .filter(col("src") =!= col("dst"))
          .distinct()
      }
    // r15: the per-round (src, label) count and the per-node argmax
    // both key on src, so a SRC-partitioned edge checkpoint makes
    // every round's aggregates partition-local — PROVIDED the label
    // map rides the join as an explicit broadcast: the loop's
    // relations are stats-free checkpoints, so without the hint the
    // static plan re-exchanges the edges on the JOIN key (dst) and
    // the layout never reaches the aggregate. r17: captured in ONE
    // materialization (partition-first-and-count,
    // [[ShuffleSizing.partitionedMaterializeCounted]]) — the old flat
    // cut existed only to feed the count. Beyond the broadcast bound
    // the op falls back to exactly the pre-r15 shuffling plan.
    val (parted, n, _) =
      ShuffleSizing.partitionedMaterializeCounted(sym, col("src"), materialize)
    ShuffleSizing.withEdgeBoundedShuffle(edges0.sparkSession, n) {
      rounds(parted, iterations, materialize)
    }
    }(materialize)
  }

  /** [[labelPropagation]] over a SHARED [[GraphCapture]] — the capture
    * (symmetrize + materialize + partition) is paid once by the caller
    * and reused across the graph family; this call is rounds-only.
    * Bit-identical to the direct form on the same graph (spec-pinned). */
  def labelPropagation(g: GraphCapture, iterations: Int,
                       materialize: DataFrame => DataFrame): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    CacheHygiene.scoped(g.spark) {
      ShuffleSizing.withEdgeBoundedShuffle(g.spark, g.edgeCount) {
        rounds(g.keyed("src", "dst"), iterations, materialize)
      }
    }(materialize)
  }

  def labelPropagation(g: GraphCapture, iterations: Int): DataFrame =
    labelPropagation(g, iterations, _.localCheckpoint())

  /** The synchronous rounds over a src-partitioned edge relation. */
  private def rounds(parted: DataFrame, iterations: Int,
                     materialize: DataFrame => DataFrame): DataFrame = {
    var labels = parted.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    val smallV = labels.count() <= ShuffleSizing.BroadcastNodeLimit
    def labelSide(df: DataFrame): DataFrame =
      if (smallV) broadcast(df) else df
    for (_ <- 1 to iterations) {
      labels = materialize(
        parted.join(labelSide(labels.withColumnRenamed("id", "__nid")),
            col("dst") === col("__nid"))
          .groupBy(col("src"), col("label")).agg(count(lit(1)).as("n"))
          // argmax by (n desc, label asc) as one struct-max: labels
          // enter negated so the lexicographic max lands on the
          // smallest label among the tied-most-frequent
          .groupBy(col("src"))
          .agg(max(struct(col("n"), (-col("label")).as("__neg"))).as("__m"))
          .select(col("src").as("id"), (-col("__m.__neg")).as("label")))
    }
    labels
  }
}
