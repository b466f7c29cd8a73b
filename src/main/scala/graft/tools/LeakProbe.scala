package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Replicate GraphCaptureSpec's op sequence, printing the persistent
  * RDD registry delta after each step to locate a leak. */
object LeakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sc = spark.sparkContext

    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 13L), (5L, 10L),
      (20L, 21L), (20L, 22L), (20L, 23L), (20L, 24L),
      (30L, 31L)).toDF("a", "b")

    var last = sc.getPersistentRDDs.keySet
    def step(label: String): Unit = {
      val now = sc.getPersistentRDDs.keySet
      val added = (now -- last).toSeq.sorted.map { id =>
        s"$id@" + sc.getPersistentRDDs(id).toString.take(40)
      }
      println(s"[leak] $label: +${added.mkString(" | ")} (live=${now.size})")
      last = now
    }

    val g = graft.ops.GraphCapture.capture(pairs, "a", "b")
    step("capture")
    val ccd = graft.ops.Dedup.connectedComponents(
      pairs.select(col("a").as("id_a"), col("b").as("id_b")), driverMaxEdges = 0)
    ccd.collect(); step("cc direct")
    graft.ops.Dedup.connectedComponents(g, maxIter = 50, driverMaxEdges = 0).collect()
    step("cc shared")
    graft.ops.Dedup.connectedComponents(g).collect()
    step("cc driver")
    val lp = graft.ops.LabelProp.labelPropagation(pairs, "a", "b", iterations = 3)
    lp.collect()
    step("lp direct")
    val lp2 = graft.ops.LabelProp.labelPropagation(g, iterations = 3)
    lp2.collect()
    step("lp shared")
    val sym = pairs.select(col("a").as("s"), col("b").as("t"))
      .unionByName(pairs.select(col("b").as("s"), col("a").as("t")))
      .filter(col("s") =!= col("t")).distinct()
    val pr = graft.ops.PageRank.pageRank(sym, "s", "t", iterations = 2)
    pr.collect()
    step("pr direct")
    val pr2 = graft.ops.PageRank.pageRank(g, iterations = 2)
    pr2.collect()
    step("pr shared")
    val sources = Seq(1L, 20L).toDF("id")
    val bfsDirect = graft.ops.Bfs.hopDistance(pairs, sources, "a", "b", maxHops = 4)
    step("bfs direct")
    val bfsShared = graft.ops.Bfs.hopDistance(g, sources, maxHops = 4)
    step("bfs shared")
    graft.ops.CacheHygiene.release(bfsDirect)
    graft.ops.CacheHygiene.release(bfsShared)
    step("bfs released")
    g.release()
    step("capture released")
    spark.stop()
  }
}
