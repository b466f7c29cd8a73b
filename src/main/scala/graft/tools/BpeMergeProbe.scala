package graft.tools

import org.apache.spark.sql.SparkSession

/** r10 directive #3 evidence: the delta-maintained BPE pair counts —
  * per-step cost must track the AFFECTED-word mass (the words whose
  * symbol string contains the merged pair), not the whole word table.
  * Runs the instrumented learner at nMerges = 64 and 256 over the sf
  * documents and prints the per-step (affected words, seconds) series
  * binned by step range, plus the total — the PLANS.md record.
  */
object BpeMergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    // two corpora: the gate's documents table (tiny 31-token synthetic
    // vocabulary — merges exhaust fast), and a REAL-vocabulary stress:
    // customer-name identifiers, one distinct word per customer
    // (15 000 at sf0.1) — early merges (hot digit pairs) rewrite
    // nearly every word, late merges touch a handful, so per-step cost
    // must DECAY with the affected mass, which a full per-step
    // re-aggregate could never show
    import org.apache.spark.sql.functions.col
    val corpora = Seq(
      "documents" -> graft.core.Tables.table(spark, dir, "documents")
        .select(col("text")),
      "cust-ids" -> graft.core.Tables.table(spark, dir, "customer")
        .select(col("c_name").as("text")))
    for ((cname, docs) <- corpora) {
      val nWords = graft.ops.BpeTrain.wordCounts(docs, "text").count()
      println(s"[bpe-probe] corpus=$cname distinct words: $nWords")
      for (n <- Seq(64, 256)) {
        val t0 = System.nanoTime()
        val (merges, stats) = graft.ops.BpeTrain.learnMergesInstrumented(
          docs, "text", nMerges = n)
        val total = (System.nanoTime() - t0) / 1e9
        // bin by step range so the decay is visible in one line each
        val bins = Seq((1, 16), (17, 64), (65, 128), (129, 256))
          .filter(_._1 <= merges.size)
        println(f"[bpe-probe] corpus=$cname nMerges=$n%-4d learned=${merges.size}%-4d total=$total%7.2fs")
        bins.foreach { case (lo, hi) =>
          val in = stats.filter(s => s.step >= lo && s.step <= hi)
          if (in.nonEmpty) {
            val aw = in.map(_.affectedWords)
            val sec = in.map(_.sec)
            println(f"[bpe-probe]   steps $lo%3d-$hi%-3d affectedWords avg=${aw.sum / aw.size}%-7d " +
              f"max=${aw.max}%-7d stepSec avg=${sec.sum / sec.size}%6.3f max=${sec.max}%6.3f")
          }
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      // the PRODUCTION surface at this corpus size: learnMerges'
      // small-corpus driver fast path (zero per-step Spark jobs) —
      // the number a user of merges()/q128 actually pays
      val t1 = System.nanoTime()
      val prod = graft.ops.BpeTrain.learnMerges(docs, "text", nMerges = 256)
      println(f"[bpe-probe] corpus=$cname nMerges=256 PRODUCTION (driver fast path) " +
        f"learned=${prod.size}%-4d total=${(System.nanoTime() - t1) / 1e9}%7.2fs")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
