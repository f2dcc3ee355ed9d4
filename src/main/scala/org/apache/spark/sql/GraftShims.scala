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

  /** Bucket spec of a catalog table as (numBuckets, bucketCols, sortCols),
    * None when the table is unbucketed. Reading it from the catalog (vs
    * threading a count parameter around) makes bucketed APPENDS
    * mismatch-proof: the writer re-states exactly the spec the table was
    * created with.
    */
  def bucketSpec(spark: SparkSession, table: String): Option[(Int, Seq[String], Seq[String])] = {
    val ss = spark.asInstanceOf[classic.SparkSession].sessionState
    val ident = ss.sqlParser.parseTableIdentifier(table)
    ss.catalog.getTableMetadata(ident).bucketSpec
      .map(b => (b.numBuckets, b.bucketColumnNames, b.sortColumnNames))
  }

  /** Resolved storage location of a catalog table — correct under any
    * current database (<warehouse>/<db>.db/<table>), unlike path
    * reconstruction from the warehouse dir.
    */
  def tableLocation(spark: SparkSession, table: String): java.net.URI = {
    val ss = spark.asInstanceOf[classic.SparkSession].sessionState
    ss.catalog.getTableMetadata(ss.sqlParser.parseTableIdentifier(table)).location
  }
}
