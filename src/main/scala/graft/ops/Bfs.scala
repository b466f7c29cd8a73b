package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-source BFS (shortest hop distance) over an edge list —
  * the graph-traversal primitive behind "documents within k citation
  * hops of a seed set" / contamination-spread style curation queries.
  *
  * Pregel-shaped: a driver loop of `maxHops` supersteps, each ONE
  * frontier⋈edges shuffle join + a distinct + an anti-join against the
  * visited set. The frontier only ever shrinks relative to the
  * reachable set and the visited set is the output accumulator — at
  * 1000 executors each superstep is a normal keyed join whose cost
  * tracks the frontier size, and `maxHops` is a small constant (the
  * driver loop is over DEPTH, not data). Frontiers are cached and
  * explicitly unpersisted; for deep traversals on real clusters,
  * checkpoint every ~10 hops to cut lineage (documented, not needed at
  * maxHops ≤ 5).
  *
  * Determinism: pure integer set algebra — hop numbers are the
  * superstep index; min-hop per node is implied by first discovery.
  */
object Bfs {

  /** Hop distance (0..maxHops) from any node in `sources` over
    * undirected `edges(src,dst)`. Returns (id, hops) for reached nodes. */
  def hopDistance(edges: DataFrame, sources: DataFrame, src: String,
                  dst: String, maxHops: Int): DataFrame = {
    val und = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct().cache()
    var visited = sources.select(col(sources.columns.head).as("id"))
      .distinct().withColumn("hops", lit(0)).cache()
    var frontier = visited.select(col("id"))
    var hop = 0
    while (hop < maxHops) {
      hop += 1
      val next = frontier.join(und, frontier("id") === und("u"))
        .select(col("v").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(hop)).cache()
      val nv = visited.union(next).cache()
      nv.count() // materialise before dropping the parents from cache
      frontier = next.select(col("id"))
      visited.unpersist(); visited = nv
    }
    und.unpersist()
    visited
  }
}
