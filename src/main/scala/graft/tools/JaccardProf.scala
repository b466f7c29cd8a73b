package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Adjudication probe for q26's size-ratio posting-carry (r12 commit
  * 7139764): times [[graft.ops.Dedup.jaccardPairs]] (sizes ride the
  * postings; ratio filter BEFORE the pair-count shuffle) against the
  * pre-r12 shape (bare postings self-join; sizes joined AFTER the
  * pair aggregation) on the same fixture, and checks the outputs are
  * identical. Run at sf0.1 and sf1; record the winner in the Dedup
  * measured-default note. */
object JaccardProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.core.Tables.table(spark, dir, "documents").localCheckpoint()

    val (n, num, den, maxDf) = (3, 6, 10, 1000L)

    // the pre-r12 shape, reproduced verbatim: postings self-join with
    // no size payload, sizes joined post-aggregation
    def oldShape(): DataFrame = {
      val perDoc = graft.ops.Dedup.shingleIndex(docs, "doc_id", "text", n, maxDf = 0)
      val sizes = perDoc.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      val idx = perDoc.join(
        perDoc.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select(col("shingle")), Seq("shingle"))
      idx.select(col("shingle"), col("id").as("id_a"))
        .join(idx.select(col("shingle"), col("id").as("id_b")), Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_common"))
        .join(sizes.select(col("id").as("id_a"), col("sz").as("size_a")), Seq("id_a"))
        .join(sizes.select(col("id").as("id_b"), col("sz").as("size_b")), Seq("id_b"))
        .filter(col("n_common") * den >= (col("size_a") + col("size_b") - col("n_common")) * num)
        .select(col("id_a"), col("id_b"), col("n_common"), col("size_a"), col("size_b"))
    }
    def newShape(): DataFrame =
      graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", n, num, den, maxDf)

    def time(label: String)(f: => DataFrame): Long = {
      // warm once, then two timed runs, report min
      f.count()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val c = f.count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      println(f"[jprof] $label%-22s min ${ts.map(_._1).min}%.2f s  runs ${ts.map(t => f"${t._1}%.2f").mkString("/")}  rows ${ts.head._2}")
      ts.head._2
    }
    val ra = time("posting-carry (r12+)")(newShape())
    val rb = time("post-agg joins (r11)")(oldShape())
    require(ra == rb, s"shapes disagree: $ra vs $rb")
    val a = newShape().orderBy("id_a", "id_b").collect().toSeq
    val b = oldShape().orderBy("id_a", "id_b").collect().toSeq
    println(s"[jprof] outputs identical: ${a == b}")
    spark.stop()
  }
}
