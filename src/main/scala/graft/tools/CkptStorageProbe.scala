package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** r18 probe for the graph family's wall VARIANCE (q137 sf1 bench runs
  * [77.6, 13.7, 46.0] s with identical shuffle rows and zero spill —
  * GC-shaped): `Dataset.localCheckpoint()` stores MEMORY_AND_DISK
  * DESERIALIZED, i.e. tens of millions of UnsafeRow objects live on
  * the heap for every captured edge relation and every per-round cut.
  * Spark 4 exposes `localCheckpoint(eager, storageLevel)`; serialized
  * block storage (MEMORY_AND_DISK_SER) stores one byte region per
  * block instead of per-row objects, trading a copy on read for
  * old-gen relief.
  *
  * A/B: LabelProp(3 rounds, assumeSymmetric) over the sf1 basket
  * graph, alternating DEFAULT vs SER materialize, N runs each in one
  * JVM, result checksums asserted equal.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *     ./run_local.sh graft.tools.CkptStorageProbe /tmp/gensf1 3
  */
object CkptStorageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val sc = spark.sparkContext

    def gcStats(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    def reset(): Unit = {
      graft.ops.CacheHygiene.quietRelease {
        sc.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      System.gc()
    }
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val cols = df.columns.map(c => col(c).cast("string"))
      val r = df.select(xxhash64(cols: _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val ser: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val dflt: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.localCheckpoint()

    def leg(name: String, mat: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : (Double, (Long, Long)) = {
      reset()
      val (gc0, gt0) = gcStats()
      val t0 = System.nanoTime()
      val edges = graft.ops.BasketEdges.edges(
        graft.core.Tables.table(spark, dir, "lineitem"), "l_orderkey", "l_partkey")
      val lp = graft.ops.LabelProp.labelPropagation(
        edges, "src", "dst", iterations = 3, assumeSymmetric = true, materialize = mat)
      val s = sig(lp)
      val dt = (System.nanoTime() - t0) / 1e9
      val (gc1, gt1) = gcStats()
      println(f"[ckpt] $name%-8s ${dt}%7.2f s  gcCount=${gc1 - gc0}%4d gcTime=${(gt1 - gt0) / 1000.0}%6.2f s")
      (dt, s)
    }

    // JIT warm-up leg (discarded)
    leg("warmup", dflt)
    var sigs = Set.empty[(Long, Long)]
    for (_ <- 1 to reps) {
      sigs += leg("default", dflt)._2
      sigs += leg("ser", ser)._2
    }
    require(sigs.size == 1, s"storage level changed results: $sigs")
    println("[ckpt] results identical across storage levels")
    spark.stop()
  }
}
