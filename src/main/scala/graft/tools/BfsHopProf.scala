package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dissect ONE BFS superstep over the shared capture: which piece of
  * the hop owns the wall (frontier join+distinct, anti-join, union,
  * the count action, broadcast builds). */
object BfsHopProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime(); body
      println(f"[bfshop] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val li = graft.core.Tables.table(spark, dir, "lineitem")
    val edges = graft.ops.BasketEdges.edges(li, "l_orderkey", "l_partkey")
    val g = graft.ops.GraphCapture.capture(edges, "src", "dst", symmetrize = false)
    val und = g.keyed("v", "u")
    val sources = graft.core.Tables.table(spark, dir, "part")
      .filter(col("p_partkey") % 50 === 0).select(col("p_partkey"))

    val visited = sources.select(col("p_partkey").as("id"))
      .distinct().withColumn("hops", lit(0)).cache()
    visited.count()
    val frontier = visited.select(col("id"))

    time("scan capture (count)") { und.count() }
    time("join frontier (bc) only") {
      und.join(broadcast(frontier), frontier("id") === und("u"))
        .select(col("v").as("id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("join + distinct") {
      und.join(broadcast(frontier), frontier("id") === und("u"))
        .select(col("v").as("id")).distinct()
        .write.format("noop").mode("overwrite").save()
    }
    time("join + distinct + anti") {
      und.join(broadcast(frontier), frontier("id") === und("u"))
        .select(col("v").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .write.format("noop").mode("overwrite").save()
    }
    time("full hop (count, union, cache)") {
      val next = und.join(broadcast(frontier), frontier("id") === und("u"))
        .select(col("v").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(1)).cache()
      val nv = visited.union(next).cache()
      nv.count()
      next.unpersist(); nv.unpersist()
    }
    // hop 2 shape: big frontier (~19k ids)
    val f2 = und.join(broadcast(frontier), frontier("id") === und("u"))
      .select(col("v").as("id")).distinct().cache()
    val n2 = f2.count()
    println(s"[bfshop] hop-2 frontier = $n2")
    time("hop2 join + distinct + anti") {
      und.join(broadcast(f2), f2("id") === und("u"))
        .select(col("v").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .write.format("noop").mode("overwrite").save()
    }
    f2.unpersist()
    time("full hopDistance(g, sources, 3)") {
      val bf = graft.ops.Bfs.hopDistance(g, sources, maxHops = 3)
      bf.write.format("noop").mode("overwrite").save()
      graft.ops.CacheHygiene.release(bf)
    }
    g.release()
    spark.stop()
  }
}
