package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting on an undirected graph, with per-node
  * participation counts.
  *
  * Algorithm: degree orientation (the standard distributed-triangle
  * trick, cf. Suri & Vassilvitskii "Counting Triangles and the Curse
  * of the Last Reducer", WWW'11): orient every undirected edge from
  * the (degree, id)-smaller endpoint to the larger. Every node's
  * OUT-degree is then O(√m) regardless of its raw degree, so the
  * wedge self-join on the out-source — the quadratic step — is bounded
  * per key even for celebrity nodes; a naive wedge join on raw
  * adjacency would square the hub degree. Each triangle is emitted
  * exactly once (at its orientation apex), then exploded to its three
  * corners for per-node counts.
  *
  * Shuffles: degree agg, two joins (wedge, closure), corner agg — all
  * key-partitioned hash operations; nothing is broadcast-dependent or
  * driver-side, so the plan survives arbitrary graph size.
  */
object Triangles {

  /** Per-node triangle counts. Input edges may be directed/duplicated;
    * they are canonicalized (self-loops dropped, both directions
    * merged) first. Output: (id, n_triangles) for nodes in ≥1
    * triangle. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    val deg = und.select(col("u").as("id")).unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

    // Orient: (deg, id) lexicographic — total order, so exactly one
    // direction per edge.
    val oriented = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))

    // Wedges at the apex: two out-edges (a→b, a→c), deduped by b<c.
    val out1 = oriented.select(col("src").as("a"), col("dst").as("b"))
    val out2 = oriented.select(col("src").as("a"), col("dst").as("c"))
    val wedges = out1.join(out2, "a").filter(col("b") < col("c"))

    // Closure: the third edge b–c exists in SOME orientation.
    val closing = oriented.select(
      least(col("src"), col("dst")).as("b"), greatest(col("src"), col("dst")).as("c"))
    val tris = wedges.join(closing, Seq("b", "c"), "leftsemi")

    tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Global triangle count (one row). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    triangleCounts(edges, srcCol, dstCol)
      .agg((sum(col("n_triangles")) / 3).cast("long").as("n_triangles"))
}
