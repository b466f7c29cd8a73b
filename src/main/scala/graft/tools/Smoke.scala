package graft.tools
import org.apache.spark.sql.SparkSession
/** Replicates the driver's t1 smoke: entry(spark) rows > 0, on a
  * vanilla session (no graft tuning confs) like the driver would use. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.map(_.name).mkString(",")}")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
