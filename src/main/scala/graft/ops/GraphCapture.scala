package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE materialized, hash-partitioned capture of a SYMMETRIC edge
  * relation, shared across the whole iterative graph family
  * (connected components / label propagation / PageRank / BFS).
  *
  * Why it exists (r16 verdict directive #2): each of the four
  * operators used to pay its own |E|-sized capture of the same graph —
  * symmetrize, materialize, count, re-partition-materialize — and at
  * sf10 that capture DOMINATED the wall of the exchange-free round
  * loops it enables (~49 s capture vs ~linear rounds on the CC drill).
  * A pipeline that runs components + communities + ranks over one
  * co-purchase graph paid it three times. This handle pays it once.
  *
  * Why ONE partitioning serves all four: every operator's per-round
  * |E|-row aggregate keys on exactly one edge column — CC's
  * neighbor-min on `s`, LabelProp's vote count on `src`, PageRank's
  * contribution sum on `__dst`, BFS's frontier distinct on `v` — and
  * on a SYMMETRIC edge set the (s, t) rows equal the (t, s) rows, so
  * one s-partitioned capture is simultaneously a capture partitioned
  * on whichever side a consumer aggregates: [[keyed]] renames the
  * partition column to the consumer's aggregation key and Spark's
  * alias-aware partitioning propagation carries the layout through
  * the rename (no exchange). Symmetry is therefore a CONTRACT of this
  * class, not an option — a directed capture would silently lose the
  * layout for half its consumers.
  *
  * Derived per-node relations are partition-local on the capture:
  * node set = distinct(s) (complete, by symmetry), degree(v) =
  * count per s group (out-degree = in-degree).
  *
  * Hygiene: the capture's checkpoint blocks are CALLER-owned — the
  * operators release only their own per-round intermediates (their
  * registry diffs start after this capture exists) and never the
  * shared relation; call [[release]] when the last consumer is done.
  * Sequential-only, like [[ShuffleSizing.partitionedMaterialize]]. */
final class GraphCapture private[graft] (
    private[graft] val edges: DataFrame,
    val edgeCount: Long,
    private val ownedIds: Set[Int]) {

  private[graft] def spark = edges.sparkSession

  /** The captured relation with the consumer's column names; the FIRST
    * name lands on the partition column (the consumer's aggregation
    * key). A pure rename Project — alias-aware partitioning keeps the
    * exchange-free layout. */
  private[graft] def keyed(keyName: String, otherName: String): DataFrame =
    edges.select(col("s").as(keyName), col("t").as(otherName))

  /** All ids are integral longs — the driver union-find precondition. */
  private[graft] def longIds: Boolean =
    edges.schema.fields.forall(_.dataType == org.apache.spark.sql.types.LongType)

  /** Release the capture's checkpoint blocks (the hygiene ledger's
    * caller-owned entry). Consumers planned but not yet executed
    * against this capture become invalid — release LAST. */
  def release(): Unit = CacheHygiene.quietRelease {
    val sc = edges.sparkSession.sparkContext
    ownedIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
  }
}

object GraphCapture {

  /** Capture `pairs` as a shared symmetric edge relation.
    *
    * `symmetrize = true` (default, the near-dup-pair-list shape):
    * union both directions, drop self-loops, distinct. Pass `false`
    * ONLY when the input already carries both directions, distinct,
    * self-loop-free (e.g. [[BasketEdges]] output) — that skips the
    * |E|-row symmetrize shuffle, and a violated contract narrows
    * results exactly like `assumeSymmetric` on the operators.
    *
    * Cost: one materialization of the flat edge list (its count sizes
    * the partitioning — [[ShuffleSizing]]), one s-partitioned
    * re-materialization, flat blocks released immediately. Everything
    * after is rounds-only for every consumer. */
  def capture(pairs: DataFrame, aCol: String, bCol: String,
              symmetrize: Boolean = true,
              materialize: DataFrame => DataFrame = _.localCheckpoint()): GraphCapture = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    // guarded rename: a redundant self-alias here would erase the
    // capture's recorded partitioning ([[ShuffleSizing.renameForCapture]])
    val dir = ShuffleSizing.renameForCapture(pairs, aCol, "s", bCol, "t")
    // r18: flat-cut before the symmetrize union — its two branches
    // otherwise re-execute the caller's pair plan twice (the CC/BFS
    // double-read finding); the cut's blocks are released with the
    // capture's stale ids below
    val beforeSym = sc.getPersistentRDDs.keySet
    val sym =
      if (symmetrize) {
        val d0 = materialize(dir)
        d0.unionByName(d0.select(col("t").as("s"), col("s").as("t")))
          .filter(col("s") =!= col("t")).distinct()
      } else dir
    val symFlatIds = (sc.getPersistentRDDs.keySet -- beforeSym).toSet
    // ONE materialization (r17): partition-first-and-count instead of
    // the old flat-cut-then-repartition two-pass — see
    // [[ShuffleSizing.partitionedMaterializeCounted]].
    val before = sc.getPersistentRDDs.keySet.toSet
    val (parted, n, staleIds) =
      ShuffleSizing.partitionedMaterializeCounted(sym, col("s"), materialize)
    val partedIds = sc.getPersistentRDDs.keySet.toSet -- before -- staleIds
    // the narrow first cut is dead if the re-cut branch re-materialized,
    // and the symmetrize flat cut is dead once the capture exists
    CacheHygiene.quietRelease {
      (staleIds ++ symFlatIds).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
    new GraphCapture(parted, n, partedIds)
  }
}
