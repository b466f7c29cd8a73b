package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Piecewise timing of the q171 KMV sketch pass: lineitem scan, the
  * md5Long portability hash, the typed KmvAgg aggregation — which owns
  * the 5-6 s sf1 wall that comes with ~zero shuffle. Noop sink, warm
  * second run (§1.4).
  *
  *   ./run_local.sh graft.tools.KmvProf [sfDir]
  */
object KmvProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(df: => DataFrame): Unit = {
      noop(df)
      val t0 = System.nanoTime(); noop(df)
      println(f"[kmvprof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val li = graft.core.Tables.table(spark, dir, "lineitem")
    val standing = li.filter(col("l_orderkey") % 10 < 8)
    time("scan 80% slice (2 cols)") {
      standing.select(col("l_returnflag"), col("l_partkey"))
    }
    time("+ md5Long hash") {
      standing.select(col("l_returnflag"),
        graft.functions.TextFunctions.md5Long(col("l_partkey").cast("string")).as("__h"))
    }
    time("+ groupBy.agg(KmvAgg k=128)") {
      graft.ops.Sketches.kmvSketch(standing, Seq("l_returnflag"), col("l_partkey"), k = 128)
    }
    time("+ groupBy.agg(count) control") {
      standing.select(col("l_returnflag"),
        graft.functions.TextFunctions.md5Long(col("l_partkey").cast("string")).as("__h"))
        .groupBy(col("l_returnflag")).agg(count(col("__h")))
    }
    time("full q171") {
      graft.SparkEntry.queries("q171_kmv_merge")(spark, dir)
    }
    spark.stop()
  }
}
