package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Piecewise timing of the q144 linkage pipeline: which part of
  * linkRecordsMulti owns the wall (blocking joins, candidate distinct,
  * levenshtein verify, argmax window). Noop-sink timings per §1.4. */
object LinkProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.EntityMatch.LinkField

    val part = graft.core.Tables.part(spark, dir)
    def delCh(c: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) = concat(
      substring(c, lit(1), (k % length(c)).cast("int")),
      c.substr((k % length(c)).cast("int") + 2, length(c)))
    val key = col("p_partkey")
    val feed = part.filter(key % 20 === 0).select(
      (key + 9000000L).as("feed_id"),
      when(key % 3 === 0, delCh(col("p_name"), key)).otherwise(col("p_name")).as("name"),
      when(key % 3 === 1, delCh(col("p_type"), key)).otherwise(col("p_type")).as("ptype"),
      when(key % 5 === 0,
        when(col("p_brand") === "Brand#11", lit("Brand#12")).otherwise(lit("Brand#11")))
        .otherwise(col("p_brand")).as("brand"))
    val master = part.select(col("p_partkey"), col("p_name"), col("p_type"), col("p_brand"))

    val fields = Seq(
      LinkField("name", "p_name", 2000L, -1500L, maxDist = 2),
      LinkField("ptype", "p_type", 1500L, -1200L, maxDist = 2),
      LinkField("brand", "p_brand", 400L, -300L, maxDist = 0, block = false))

    // replicate linkRecordsMulti internals
    val fi = fields.zipWithIndex
    val f = feed.select(col("feed_id").as("__fid") +:
      fi.map { case (fl, i) => col(fl.feedCol).as(s"__f$i") }: _*)
      .filter(col("__fid").isNotNull)
    val m = master.select(col("p_partkey").as("__mid") +:
      fi.map { case (fl, i) => col(fl.masterCol).as(s"__m$i") }: _*)
      .filter(col("__mid").isNotNull)
    val maxBlockRows = 3000
    def capBlocks(keyed: DataFrame): DataFrame =
      keyed.join(
        keyed.groupBy(col("__k")).agg(sum(lit(1L)).as("__bn"))
          .filter(col("__bn") <= maxBlockRows).select(col("__k")), "__k")
    def pass(i: Int, keyf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
             onlyShort: Boolean, blockChars: Int) = {
      val short = (c: org.apache.spark.sql.Column) => length(c) < 2 * blockChars
      val fs = if (onlyShort) f.filter(short(col(s"__f$i"))) else f
      val ms0 = if (onlyShort) m.filter(short(col(s"__m$i"))) else m
      val fk = fs.filter(col(s"__f$i").isNotNull).withColumn("__k", keyf(col(s"__f$i")))
      val mk = capBlocks(ms0.filter(col(s"__m$i").isNotNull).withColumn("__k", keyf(col(s"__m$i"))))
      fk.join(mk, "__k").drop("__k")
    }
    val cands = fi.filter(_._1.block).flatMap { case (fl, i) =>
      Seq(
        pass(i, substring(_, 1, fl.blockChars), onlyShort = false, fl.blockChars),
        pass(i, c => substring(c, -fl.blockChars, fl.blockChars), onlyShort = false, fl.blockChars),
        pass(i, substring(_, 1, 1), onlyShort = true, fl.blockChars),
        pass(i, c => substring(c, -1, 1), onlyShort = true, fl.blockChars))
    }.reduce(_ unionByName _)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      // warm once, time second
      body
      val t0 = System.nanoTime(); body
      println(f"[linkprof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    fi.filter(_._1.block).foreach { case (fl, i) =>
      println(s"[linkprof] pass pre  f$i = " + pass(i, substring(_, 1, fl.blockChars), false, fl.blockChars).count())
      println(s"[linkprof] pass suf  f$i = " + pass(i, c => substring(c, -fl.blockChars, fl.blockChars), false, fl.blockChars).count())
      println(s"[linkprof] pass pre1 f$i = " + pass(i, substring(_, 1, 1), true, fl.blockChars).count())
      println(s"[linkprof] pass suf1 f$i = " + pass(i, c => substring(c, -1, 1), true, fl.blockChars).count())
    }
    time("raw cands (union of 8)") { noop(cands) }
    println(s"[linkprof] raw cands rows = ${cands.count()}")
    val dist = cands.distinct()
    time("cands.distinct") { noop(dist) }
    println(s"[linkprof] distinct rows = ${dist.count()}")
    val score = fi.map { case (fl, i) =>
      when(col(s"__f$i").isNull || col(s"__m$i").isNull, 0L)
        .when(levenshtein(col(s"__f$i"), col(s"__m$i")) <= fl.maxDist, fl.agreeMilli)
        .otherwise(fl.disagreeMilli)
    }.reduce(_ + _)
    time("distinct + score") { noop(dist.withColumn("score_milli", score)) }
    val n = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    time("distinct + repart + score") {
      noop(dist.repartition(n, col("__fid")).withColumn("score_milli", score))
    }
    time("full linkRecordsMulti") {
      noop(graft.ops.EntityMatch.linkRecordsMulti(feed, "feed_id", master, "p_partkey",
        fields, minScoreMilli = 1000L, maxBlockRows = 3000))
    }
    // r17 opt round: dissect the empty-candidate overhead seen at sf1
    // (gensf1 produces 0 candidates; the full call still cost ~3.4 s)
    locally {
      val t0 = System.nanoTime()
      val np = m.rdd.getNumPartitions
      println(f"[linkprof] ensureParallelism rdd probe    ${(System.nanoTime() - t0) / 1e9}%7.2f s (np=$np)")
    }
    val masterSpread = master.repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    time("full linkRecordsMulti (pre-spread master)") {
      noop(graft.ops.EntityMatch.linkRecordsMulti(feed, "feed_id", masterSpread, "p_partkey",
        fields, minScoreMilli = 1000L, maxBlockRows = 3000))
    }
    spark.stop()
  }
}
