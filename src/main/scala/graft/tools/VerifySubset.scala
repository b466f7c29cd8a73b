package graft.tools
import org.apache.spark.sql.SparkSession
/** Verify, restricted to query names matching a regex — the fast local
  * loop when iterating on a few new gates (full oracle_sql.json is
  * still written so tools/compare_oracle.py can run on the subset dir;
  * the compare skips queries with no dumped parquet as MISS).
  *
  * Usage: runMain graft.tools.VerifySubset <sfDir> <outDir> <nameRegex>
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rx) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked = graft.SparkEntry.queries.filter(_._1.matches(rx))
    picked.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[subset] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view.filterKeys(picked.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
