package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported way for external libraries to wrap custom Catalyst
  * expressions as user-facing Columns in Spark 4 (the Column constructor
  * taking an Expression moved behind `org.apache.spark.sql.classic`).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
