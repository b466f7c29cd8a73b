package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object ProfJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", 1000)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tune(spark)
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $name run$i rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
      }
    }
    val docs = graft.core.Tables.table(spark, dir, "documents")
    time("tokens_only") {
      docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
        .select(sum(size(col("ts")))).head().getLong(0)
    }
    time("shingles") {
      docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), explode(array_distinct(TextFunctions.shinglesFromTokens(col("__toks"), 3))).as("__s"))
        .count()
    }
    time("shingle_hashed_repart") {
      docs.select(col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("__toks"))
        .select(col("id"), explode(array_distinct(TextFunctions.shinglesFromTokens(col("__toks"), 3))).as("__s"))
        .select(col("id"), xxhash64(col("__s")).as("shingle"))
        .repartition(col("shingle")).count()
    }
    time("full_jaccard") {
      graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 6, 10, 1000).count()
    }
    spark.stop()
  }
}
