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

  /** Drop every CacheManager entry (the `private[sql]` relation cache
    * behind `DataFrame.persist`). Unpersisting a cached plan's RDDs
    * DIRECTLY (the [[graft.Blocks]] id-delta path) leaves the
    * InMemoryRelation entry behind, and that entry strongly references
    * the plan's BroadcastExchange futures and broadcast Hadoop confs —
    * (a) the reason those broadcasts can never be GC-reclaimed (the r12
    * ~40-blocks-per-run leak), and (b) a live landmine once the blocks
    * ARE force-dropped: the next structurally-identical `persist()`
    * REUSES the stale physical plan and fails fetching the destroyed
    * broadcast (the r12 q165/q191/q98 bench errors, reproduced with a
    * full stack through CachedRDDBuilder). A timed harness must clear
    * the entries, not just the blocks.
    */
  def clearRelationCache(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.clearCache()
}
