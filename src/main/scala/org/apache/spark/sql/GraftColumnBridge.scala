package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge for the graft SQL surface.
  *
  * Spark 4 made `Column` implementation-agnostic (backed by a
  * ColumnNode) and moved the conversion into `private[sql]`
  * `classic.ExpressionUtils`. The graft function library is written
  * against the public Column API; registering those compositions as SQL
  * functions needs exactly this conversion, so a one-file shim in the
  * `org.apache.spark.sql` package exposes the two directions. No
  * behavior is overridden — these are straight delegations. */
object GraftColumnBridge {
  def expression(c: Column): Expression =
    classic.SparkSession.active.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}

/** Mix-in for graft expressions that take ONE string argument and want
  * the analyzer to insert implicit casts (the tolerance of the
  * Column-chain forms they replaced, r17 advice): `AbstractDataType`
  * is `private[sql]` in Spark 4, so the `inputTypes` override must
  * live in this package — the graft expression just mixes this in. */
trait GraftStringInputCast
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
}
