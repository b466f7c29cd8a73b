package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StringType}

/** Schema-conformance semantics of the reference's `match_schema`
  * (reference: okta-sync/main.py:544-584):
  *
  *   - cast columns present in both to the declared type,
  *   - add columns missing from the input as typed nulls
  *     (okta-sync/main.py:573-577),
  *   - drop input columns absent from the schema (:580-582),
  *   - emit columns in declared schema order (:412,481 `df.reindex`).
  *
  * Implemented as a single `select` so Catalyst collapses it into the
  * scan projection — at 100 TB the dropped columns are never read
  * (column pruning reaches the parquet footer).
  */
object SchemaConform {

  def conformToSchema(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols: Seq[Column] = schema.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  /** Replace sentinel strings with null, keeping a custom NA list that the
    * caller controls — the reference deliberately excludes the literal
    * "NA" so Namibia's country code survives
    * (reference: process-geography/main.py:115-137); the sentinel
    * "0000-00-00 00:00:00" maps to null (woo-sync/main.py:272-273).
    */
  def nullifySentinels(df: DataFrame, columns: Seq[String], naValues: Seq[String]): DataFrame = {
    columns.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isin(naValues.map(lit): _*), lit(null).cast(StringType)).otherwise(col(c)))
    }
  }

  /** Default NA tokens mirroring the reference's pandas keep_default_na
    * replacement list, minus "NA" (process-geography/main.py:115-137). */
  val DefaultNaValues: Seq[String] = Seq(
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NULL", "NaN", "n/a", "nan", "null")
}
