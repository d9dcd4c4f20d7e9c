package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression converters — the
  * supported way for an external library to expose a custom Catalyst
  * `Expression` as a user-facing `Column` in Spark 4 (the Column API is
  * ColumnNode-based and no longer wraps Expression publicly).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
