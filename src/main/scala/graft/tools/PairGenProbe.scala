package graft.tools

import org.apache.spark.sql.functions._

/** A/B probe for the Jaccard pair-generation stage: the shipped
  * self-join formulation vs a per-shingle collect_list + in-bucket
  * pair explode (both downstream of the same pinned shingle index).
  * Run before touching Dedup — adopt only on a clear, reproducible win
  * with identical pair counts. */
object PairGenProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", 1000)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val docs = graft.core.Tables.table(spark, dir, "documents")

    // shared pinned index (mirrors Dedup.shingleIndex shape)
    val perDoc = docs
      .select(col("doc_id").as("id"),
        graft.functions.TextFunctions.tokens(col("text")).as("__toks"))
      .select(col("id"), explode(array_distinct(
        graft.functions.TextFunctions.shinglesFromTokens(col("__toks"), 3))).as("__s"))
      .select(col("id"), xxhash64(col("__s")).as("shingle"))
      .repartition(col("shingle"))
      .localCheckpoint(true) // isolate index build from the measured stage

    val rare = perDoc.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 1000).select(col("shingle"))
    val idx = perDoc.join(rare, Seq("shingle")).localCheckpoint(true)

    def time(name: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"[pairgen] $name run$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    time("self_join") {
      val a = idx.select(col("shingle"), col("id").as("id_a"))
      val b = idx.select(col("shingle"), col("id").as("id_b"))
      a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
        .count()
    }

    time("collect_pairs") {
      idx.groupBy(col("shingle")).agg(sort_array(collect_list(col("id"))).as("ids"))
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
            struct(x.as("id_a"), y.as("id_b")))))).as("p"))
        .groupBy(col("p.id_a"), col("p.id_b")).agg(count(lit(1)).as("n_common"))
        .count()
    }
    spark.stop()
  }
}
