package graft.tools
import org.apache.spark.sql.functions._
import graft.core.Tables
object AdcProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/tmp/gensf1"
    val emb = Tables.table(spark, dir, "embeddings").localCheckpoint()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val model = time("train")(graft.functions.ProductQuantizer.train(emb, "vec_id", "embedding", 4, 16, 8, 2))
    val codes = time("encode+materialize")(
      graft.functions.ProductQuantizer.encode(emb, "vec_id", "embedding", model).localCheckpoint())
    println("codes rows " + codes.count())
    val queries = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(10)
    val r1 = time("adcTopK on materialized codes")(
      graft.functions.ProductQuantizer.adcTopK(queries, codes, model, "vec_id", "embedding", 10).collect())
    println("rows " + r1.length)
    val codesLazy = graft.functions.ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    val r2 = time("adcTopK on lazy codes (q170 shape)")(
      graft.functions.ProductQuantizer.adcTopK(queries, codesLazy, model, "vec_id", "embedding", 10).collect())
    println("rows " + r2.length)
    val r3 = time("adcTopK lazy again")(
      graft.functions.ProductQuantizer.adcTopK(queries, codesLazy, model, "vec_id", "embedding", 10).collect())
    println("rows " + r3.length)
    spark.stop()
  }
}
