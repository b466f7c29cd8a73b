package graft.tools

import org.apache.spark.sql.SparkSession

/** Run-context band isolator (the q26/q113/q77/q78 class): measures a
  * target query in a fresh JVM, then CHURNS the session with the whole
  * catalog at a tiny SF (class loading, codegen cache, metaspace, heap
  * graph growth — everything EXCEPT data volume), then measures the
  * target again in the same JVM. A clean before/after split separates
  * "cumulative JVM/session state inflates late-sweep queries" from
  * every data-dependent explanation (page cache, shuffle files), which
  * short heavy prefixes and cold-cache runs already failed to
  * reproduce.
  *
  *   ./run_local.sh graft.tools.BandProbe <sfDir> <query> [churnDir]
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val churnDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)

    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      System.gc()
    }
    def jvmState(): String = {
      import java.lang.management.ManagementFactory._
      val classes = getClassLoadingMXBean.getLoadedClassCount
      val jit = getCompilationMXBean.getTotalCompilationTime
      val gc = getGarbageCollectorMXBeans
      var gcMs = 0L; var gcN = 0L
      gc.forEach { b => gcMs += b.getCollectionTime; gcN += b.getCollectionCount }
      val pools = getMemoryPoolMXBeans
      var codeUsed = 0L; var metaUsed = 0L; var oldUsed = 0L
      pools.forEach { p =>
        val n = p.getName
        if (n.contains("CodeHeap") || n.contains("Code Cache")) codeUsed += p.getUsage.getUsed
        if (n.contains("Metaspace") && !n.contains("Compressed")) metaUsed += p.getUsage.getUsed
        if (n.contains("Old Gen")) oldUsed = p.getUsage.getUsed
      }
      f"classes=$classes jitMs=$jit gcN=$gcN gcMs=$gcMs codeMB=${codeUsed / 1e6}%.0f " +
        f"metaMB=${metaUsed / 1e6}%.0f oldGenMB=${oldUsed / 1e6}%.0f"
    }

    def measure(tag: String): Unit = {
      fn(spark, dir).count(); reset() // warm
      (1 to 3).foreach { i =>
        val s0 = jvmState()
        val gc0 = { val b = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          var t = 0L; b.forEach(x => t += x.getCollectionTime); t }
        val jit0 = java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val gc1 = { val b = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          var t = 0L; b.forEach(x => t += x.getCollectionTime); t }
        val jit1 = java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime
        println(f"[band] $tag run$i $name $dt%.2f s  (gc +${gc1 - gc0} ms, jit +${jit1 - jit0} ms)  [$s0]")
        reset()
      }
    }

    measure("fresh")
    // churn: every catalog plan compiles + runs at the tiny SF — the
    // bench sweep's cumulative JVM state without its data volume
    val t0 = System.nanoTime()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, f) =>
      try { f(spark, churnDir).count() } catch { case _: Throwable => }
      reset()
    }
    println(f"[band] churn (${graft.SparkEntry.queries.size} queries @ $churnDir) ${(System.nanoTime() - t0) / 1e9}%.1f s")
    measure("churned")
    spark.stop()
  }
}
