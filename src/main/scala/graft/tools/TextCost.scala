package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Micro-breakdown of the text-pipeline stages at bench scale: which of
  * tokenize / shingle-transform / explode+hash actually costs. */
object TextCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val docs = graft.core.Tables.table(spark, dir, "documents")
      .repartition(32).localCheckpoint(true)
    def time(label: String)(f: => Long): Unit = {
      for (_ <- 1 to 2) { // second run = warm codegen
        val t0 = System.nanoTime(); val n = f
        println(f"[textcost] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs (n=$n)")
      }
    }
    time("scan only")(docs.agg(count(lit(1))).head().getLong(0))
    time("tokens count")(docs.select(TextFunctions.tokenCount(col("text")).as("c"))
      .agg(sum(col("c"))).head().getLong(0))
    time("tokens materialized")(docs.select(TextFunctions.tokens(col("text")).as("t"))
      .select(size(col("t")).as("c")).agg(sum(col("c"))).head().getLong(0))
    time("tokens+shingles")(docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(size(TextFunctions.shinglesFromTokens(col("t"), 3)).as("c"))
      .agg(sum(col("c"))).head().getLong(0))
    time("tokens+shingles+distinct")(docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(size(array_distinct(TextFunctions.shinglesFromTokens(col("t"), 3))).as("c"))
      .agg(sum(col("c"))).head().getLong(0))
    time("full explode+xxhash")(docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.shinglesFromTokens(col("t"), 3))).as("s"))
      .select(xxhash64(col("s")).as("h")).agg(count(lit(1))).head().getLong(0))
    spark.stop()
  }
}
