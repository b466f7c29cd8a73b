package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row
  * of the same key with right.ts <= left.ts. Spark has no built-in
  * as-of join; per the custom-operator preference order this composes
  * existing operators (union + running `last(..., ignoreNulls)` window)
  * rather than a custom SparkPlan:
  *
  *   tag left/right → union on (keys, ts) → single hash shuffle on
  *   keys → in-partition sort by (ts, side, tiebreak) → running last of
  *   the right payload → keep left rows.
  *
  * That is exactly the merge pass a hand-written AsOfJoinExec would do,
  * but it inherits Spark's shuffle/spill/AQE machinery for free: one
  * wide exchange, no point-range explosion, skew handled by AQE. Ties
  * (right.ts == left.ts) are visible to the left row; among equal
  * right timestamps the largest tiebreak column wins (deterministic).
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, rightTiebreak: String,
                   rightPayloadCols: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val payload = struct((rightTiebreak +: rightPayloadCols).distinct.map(col): _*)

    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts after right at equal ts
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(right.select(payload).schema.fields.head.dataType))
    val r = right.select((keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
      col(rightTiebreak).cast("long").as("__tb") :+ payload.as("__r")): _*)

    val lCols = left.columns
    val unioned = l.select((lCols.map(col) ++ Seq(col("__ts"), col("__side"), col("__tb"), col("__r"))): _*)
      .unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) :+ col("__match")): _*)
  }
}
