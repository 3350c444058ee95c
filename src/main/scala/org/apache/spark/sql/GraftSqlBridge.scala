package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved the Expression⇄Column bridge into `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this shim re-exports the
  * two conversions for graft's custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
