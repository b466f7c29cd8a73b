package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Detection-quality probe for the near-dup family: on the real
  * documents table, compare MinHash+LSH candidates (q27 parameters)
  * against ground-truth n-gram Jaccard pairs (the exact q26 machinery
  * with no df cap) at a grid of thresholds. Prints recall (true pairs
  * the LSH surfaced) and precision (surfaced pairs that are true) —
  * the numbers that justify shipping the approximate operator as the
  * 100 TB path. */
object MinhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val docs = graft.core.Tables.table(spark, dir, "documents")

    // ground truth: exact jaccard >= num/den over 3-gram shingles
    def truthPairs(num: Int, den: Int): Set[(Long, Long)] =
      graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
          thresholdNum = num, thresholdDen = den, maxDf = Int.MaxValue)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for ((num, den, agreeT) <- Seq((5, 10, 0.5), (7, 10, 0.7), (9, 10, 0.9))) {
      val truth = truthPairs(num, den)
      val got = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text",
          threshold = agreeT, k = 32)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val tp = (truth & got).size
      val recall = if (truth.isEmpty) 1.0 else tp.toDouble / truth.size
      val precision = if (got.isEmpty) 1.0 else tp.toDouble / got.size
      println(f"jaccard>=$num/$den vs minhash>=$agreeT%.1f (k=32): " +
        f"truth=${truth.size} surfaced=${got.size} recall=$recall%.3f precision=$precision%.3f")
    }
    spark.stop()
  }
}
