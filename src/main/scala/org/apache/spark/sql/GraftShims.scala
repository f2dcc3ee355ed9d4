package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported way for external libraries to wrap custom Catalyst
  * expressions as user-facing Columns in Spark 4 (the Column constructor
  * taking an Expression moved behind `org.apache.spark.sql.classic`) —
  * and to `Dataset.ofRows` for wrapping custom logical plans.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def hasOptimizerRule(spark: SparkSession, rule: AnyRef): Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.optimizer
      .extendedOperatorOptimizationRules.exists(_ eq rule)
}
