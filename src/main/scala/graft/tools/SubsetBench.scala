package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling-evidence bench over a SUBSET of the catalog (r18, VERDICT
  * item 7): the driver's 8-vs-32-core comparison at sf0.1 measures
  * task-launch overhead, not parallelism — at sf0.1 no query reaches
  * even 2× on 4× the cores. This tool times a named query subset at a
  * REAL scale factor so parallel efficiency can be stated from data:
  * run it twice, once per core count, on a quiesced box, and table the
  * ratios.
  *
  *   SPARK_GRAFT_CPUS=32 ./run_local.sh graft.tools.SubsetBench /tmp/gensf1 q93_...,q137_...
  *
  * Methodology matches graft.Bench (warm every plan at the sibling
  * smoke SF first, then two timed runs per query, min reported, cache
  * hygiene between runs); the output is one tab-separated line per
  * query on stdout. */
object SubsetBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SubsetBench <sfDir> <q1,q2,...>")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = names.map(n => n -> graft.SparkEntry.queries.getOrElse(n,
      sys.error(s"unknown query: $n")))
    def reset(): Unit = {
      graft.ops.CacheHygiene.quietRelease {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        spark.catalog.clearCache()
      }
      System.gc()
    }
    // warm at the smoke SF (janino/JIT), like graft.Bench
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getPath else sfDir
    }
    fns.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count(): Unit } catch { case _: Throwable => () }
      reset()
    }
    println(s"# cpus=$cpus sf=$sfDir")
    fns.foreach { case (name, fn) =>
      val runs = (1 to 2).map { _ =>
        reset()
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name\t${runs.min}%.3f\t${runs.map(r => f"$r%.2f").mkString("/")}")
    }
    spark.stop()
  }
}
