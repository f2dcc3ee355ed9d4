package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Event-sequence mining over per-entity ordered streams — the
  * clickstream/telemetry analyses that sit on top of sessionization:
  * first-order transition structure and frequent whole-session paths.
  * Both are window-then-aggregate plans keyed by the entity: nothing
  * global sorts, and the post-window state is O(#states²) /
  * O(#distinct paths), not O(events).
  */
object Sequences {

  /** First-order Markov transition matrix over each entity's
    * (orderCol, tieCol)-ordered state stream: for every observed
    * (state → next) pair, its count and the row-normalized probability
    * P(next | state). The structural fingerprint of user behavior —
    * drift in this matrix (e.g. via [[graft.etl.Drift.psi]] over the
    * probabilities) catches flow changes volume metrics miss.
    *
    * One keyed window (per entity) for the `lead`, one (state, next)
    * agg; the normalizing window rides the O(#states²) aggregated rows.
    */
  def transitionMatrix(df: DataFrame, entityCol: String, orderCol: Column,
                       tieCol: Column, stateCol: String,
                       decimals: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCol, tieCol)
    val pairs = df
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("state"), col("__next").as("next"))
      .agg(count(lit(1)).as("n"))
    val wState = Window.partitionBy(col("state"))
    pairs.withColumn("p",
      roundStable(col("n").cast("double") / sum(col("n")).over(wState),
        decimals))
  }

  /** Frequent whole-session paths: gap-sessionize each entity's stream
    * (a new session starts after `gapMicros` of silence — the q45
    * contract), render each session as its ordered `state` sequence
    * joined by `>`, and count identical paths. The top navigation
    * patterns, "funnel discovery" without pre-declaring the funnel.
    *
    * Order inside a session is pinned by (orderCol, tieCol) via a
    * sort_array over collected structs — `collect_list` alone has NO
    * ordering guarantee under parallel aggregation. Per-key state after
    * the session agg is O(#sessions), then O(#distinct paths).
    */
  def sessionPaths(df: DataFrame, entityCol: String, tsCol: String,
                   tieCol: Column, stateCol: String,
                   gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), tieCol)
    val ts = unix_micros(col(tsCol).cast("timestamp"))
    val sessioned = df
      .withColumn("__brk",
        when(ts - lag(ts, 1).over(w) > gapMicros, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned
      .groupBy(col(entityCol), col("__sess"))
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"),
        tieCol.as("tb"), col(stateCol).as("s")))).as("__evs"))
      .select(concat_ws(">",
        transform(col("__evs"), e => e.getField("s"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
  }
}
