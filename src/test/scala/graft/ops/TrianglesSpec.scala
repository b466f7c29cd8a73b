package graft.ops

import graft.SparkSpecBase

class TrianglesSpec extends SparkSpecBase {
  import spark.implicits._

  test("counts K4 triangles per node, ignoring duplicates/direction/self-loops") {
    // K4 on {1,2,3,4}: 4 triangles, every node in exactly 3. Edges
    // arrive messy: some reversed, one duplicated, one self-loop.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (2L, 4L), (3L, 4L), (4L, 4L)
    ).toDF("src", "dst")
    val out = Triangles.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_triangles")).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val total = Triangles.triangleCount(edges, "src", "dst").collect()(0).getLong(0)
    assert(total == 4L)
  }

  test("path graph has no triangles; star has none; one closure makes one") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Triangles.triangleCounts(path, "src", "dst").count() == 0)
    // star center 0 + leaves: no triangle until two leaves connect
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    assert(Triangles.triangleCounts(star, "src", "dst").count() == 0)
    val closed = star.union(Seq((2L, 3L)).toDF("src", "dst"))
    val out = Triangles.triangleCounts(closed, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_triangles")).toMap
    assert(out == Map(0L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub skew: wedge work is bounded by orientation (result exact)") {
    // Hub 0 connected to 1..20, plus a ring among leaves 1-2,2-3,...;
    // triangles are exactly (0, i, i+1) for consecutive ring pairs.
    val hub = (1L to 20L).map(i => (0L, i))
    val ring = (1L until 20L).map(i => (i, i + 1))
    val edges = (hub ++ ring).toDF("src", "dst")
    val out = Triangles.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_triangles")).toMap
    assert(out(0L) == 19L)           // one per ring edge
    assert(out(1L) == 1L && out(20L) == 1L)
    assert((2L to 19L).forall(i => out(i) == 2L))
  }
}
