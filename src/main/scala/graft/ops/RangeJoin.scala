package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match points p to intervals [start, end).
  *
  * A naive range join is a nested-loop cross product — O(|points| ×
  * |intervals|). The scalable form buckets the time axis: each interval
  * explodes to the buckets it covers, each point maps to exactly one
  * bucket, and an equi-join on bucket id + exact range filter recovers
  * the precise result. Cost drops to O(points + intervals × avg-span /
  * bucketWidth + true-matches) and the join shuffles on bucket id like
  * any equi-join (AQE, skew handling for free). Bucket width tunes the
  * tradeoff: ~median interval length is a good default.
  */
object RangeJoin {

  /** Join points (µs-long column `ptCol`) to intervals (µs-long columns
    * `startCol`/`endCol`, end exclusive). All interval columns are kept;
    * bucketWidthUs controls the equi-join fan-out. */
  def pointsInIntervals(points: DataFrame, ptCol: String,
                        intervals: DataFrame, startCol: String, endCol: String,
                        bucketWidthUs: Long): DataFrame = {
    val p = points.withColumn("__bucket", expr(s"$ptCol div $bucketWidthUs"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol div $bucketWidthUs"),
        // end is exclusive: the last covered bucket is (end-1) div width
        expr(s"($endCol - 1) div $bucketWidthUs"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
