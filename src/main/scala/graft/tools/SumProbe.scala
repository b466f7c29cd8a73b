package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
object SumProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/tmp/gensf10"
    val emb = graft.core.Tables.table(spark, dir, "embeddings").localCheckpoint()
    val ex = emb.select(col("label").as("g"), posexplode(col("embedding")).as(Seq("pos", "v")))
    def time[T](l: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[sum] $l%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    val dec = ex.groupBy(col("g"), col("pos"))
      .agg(sum(floor(col("v").cast("double") * lit(1073741824.0)).cast(DecimalType(38,0))).as("m"))
    time("decimal sum (current)")(dec.collect())
    time("decimal sum again")(dec.collect())
    val lng = ex
      .select(col("g"), col("pos"),
        floor(col("v").cast("double") * lit(1073741824.0)).cast("long").as("q"))
      .withColumn("salt", pmod(xxhash64(col("g"), col("pos"), col("q")), lit(4096)))
      .groupBy(col("g"), col("pos"), col("salt")).agg(sum(col("q")).as("pm"))
      .groupBy(col("g"), col("pos")).agg(sum(col("pm").cast(DecimalType(38,0))).as("m"))
    time("two-level long sum")(lng.collect())
    time("two-level long again")(lng.collect())
    val plain = ex
      .select(col("g"), col("pos"),
        floor(col("v").cast("double") * lit(1073741824.0)).cast("long").as("q"))
      .groupBy(col("g"), col("pos")).agg(sum(col("q")).as("m"))
    time("plain long sum")(plain.collect())
    val noagg = ex.select(floor(col("v").cast("double") * lit(1073741824.0)).cast("long").as("q"))
    time("explode+floor only (sum all)")(noagg.agg(sum(col("q"))).head())
    val a = dec.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val b = lng.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    println("[sum] identical: " + (a == b))
    spark.stop()
  }
}
