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

  /** Per-state conditional entropy of the first-order Markov chain —
    * HOW PREDICTABLE is the next event given the current one, the
    * information-theoretic summary of [[transitionMatrix]]: `H(next |
    * state) = −Σ p·ln p` per state in nats, with the modal next state
    * and its share (deterministic tiebreak: count desc, state asc —
    * the q248 discipline). A state with H near 0 is a corridor (its
    * successor is known); H near ln(#states) is a hub. Same scale
    * shape as [[transitionMatrix]]: one keyed lead window over raw
    * events, one (state, next) agg, then windows over the O(#states²)
    * cell table.
    */
  def markovEntropy(df: DataFrame, entityCol: String, orderCol: Column,
                    tieCol: Column, stateCol: Column,
                    digits: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCol, tieCol)
    val pairs = df
      .withColumn("__s", stateCol)
      .withColumn("__n", lead(col("__s"), 1).over(w))
      .filter(col("__n").isNotNull)
    val cells = pairs.groupBy(col("__s").as("state"), col("__n").as("next"))
      .agg(count(lit(1)).as("n"))
    val wState = Window.partitionBy(col("state"))
    val wRank = Window.partitionBy(col("state"))
      .orderBy(col("n").desc, col("next"))
    val p = col("n").cast("double") / col("__tot").cast("double")
    cells
      .withColumn("__tot", sum(col("n")).over(wState))
      .withColumn("__h", -p * log(p))
      .withColumn("__rk", row_number().over(wRank))
      .groupBy(col("state"))
      .agg(
        max(col("__tot")).as("n_transitions"),
        count(lit(1)).as("n_next_states"),
        roundStable(sum(col("__h")), digits).as("h_cond"),
        max(when(col("__rk") === 1, col("next"))).as("top_next"),
        roundStable(max(when(col("__rk") === 1,
          col("n").cast("double") / col("__tot"))), digits)
          .as("top_share"))
  }

  /** Timeout-constrained ordered funnel (the ClickHouse `windowFunnel`
    * shape): how deep into `steps` does each entity get with the WHOLE
    * chain inside a `windowMicros` span — the conversion readout where
    * "viewed in January, bought in June" must NOT count. Strict
    * ordering, chained nearest-predecessor semantics: each step-k
    * event links to the LATEST qualified step-(k−1) event before it,
    * which minimizes the chain's span and is therefore optimal for
    * distinct consecutive steps. No sequential scan and no self-join:
    * because events arrive time-sorted per entity, "latest step-k
    * predecessor (and ITS chain start)" is a running `max(when(...))`
    * over ONE keyed window — monotone along the sort, so k running
    * maxes compose into the full chain; depth is then a per-entity
    * max. Output: one row per depth 0..k with its entity count
    * (depth d = reached step d+1 within window, monotone ≥ depth
    * d+1's count). Window arithmetic in integer MICROSECONDS on both
    * engines (the q95 boundary lesson).
    */
  def windowFunnel(df: DataFrame, entityCol: String, tsCol: Column,
                   tieCol: Column, typeCol: Column, steps: Seq[String],
                   windowMicros: Long): DataFrame = {
    require(steps.size == 3, "windowFunnel implements the 3-step chain")
    val Seq(s1, s2, s3) = steps
    val w = Window.partitionBy(col(entityCol)).orderBy(tsCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(tsCol)
    // start of the best (latest-predecessor) chain visible at each row
    val v1 = max(when(typeCol === s1, us)).over(w)
    val staged = df
      .withColumn("__us", us)
      .withColumn("__v1", v1)
    // at step-2 rows, the chain start they inherit; running max carries
    // the latest qualified step-2's start forward (monotone in ts)
    val v2start = max(when(typeCol === s2 && col("__v1").isNotNull &&
      col("__us") - col("__v1") <= windowMicros, col("__v1"))).over(w)
    val chained = staged.withColumn("__v2s", v2start)
      .withColumn("__d1", when(typeCol === s1, 1L).otherwise(0L))
      .withColumn("__d2", when(typeCol === s2 && col("__v1").isNotNull &&
        col("__us") - col("__v1") <= windowMicros, 1L).otherwise(0L))
      .withColumn("__d3", when(typeCol === s3 && col("__v2s").isNotNull &&
        col("__us") - col("__v2s") <= windowMicros, 1L).otherwise(0L))
    // depth = d1 + d2 + d3 directly: a qualified step-3 implies a
    // qualified step-2 chain start exists, which implies a step-1 —
    // consecutiveness is structural, not enforced after the fact
    val perEntity = chained.groupBy(col(entityCol))
      .agg((max(col("__d1")) + max(col("__d2")) + max(col("__d3")))
        .as("__depth"))
    perEntity.groupBy(col("__depth").as("depth"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** Longest consecutive-day activity streak per key — the classic
    * gaps-and-islands readout (engagement "streaks", sensor uptime
    * runs): distinct active days collapse to islands via the
    * `day − row_number` trick (consecutive days share the constant),
    * then per key the longest island wins with earliest-start
    * tiebreak. Emits the streak bounds plus the island count and
    * total active days — the "745 active days in 201 islands, best
    * run 14" engagement summary. B32's interval ops merge given
    * ranges; this DISCOVERS runs from point-in-time activity. Two
    * keyed aggs + two keyed windows, all over O(#key × #days) distinct
    * rows — calendar-bounded, never event-bounded.
    */
  def longestStreak(df: DataFrame, keys: Seq[String],
                    dateCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val days = df.select(keyCols :+ dateCol.as("__d"): _*).distinct()
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__d"))
    val islands = days
      .withColumn("__grp", datediff(col("__d"), lit("1970-01-01")) -
        row_number().over(wOrd))
      .groupBy(keyCols :+ col("__grp"): _*)
      .agg(count(lit(1)).as("__len"), min(col("__d")).as("__start"),
        max(col("__d")).as("__end"))
    val wBest = Window.partitionBy(keyCols: _*)
      .orderBy(col("__len").desc, col("__start").asc)
    islands
      .withColumn("__rk", row_number().over(wBest))
      .withColumn("__ni", count(lit(1)).over(
        Window.partitionBy(keyCols: _*)))
      .withColumn("__tot", sum(col("__len")).over(
        Window.partitionBy(keyCols: _*)))
      .filter(col("__rk") === 1)
      .select(keyCols ++ Seq(col("__len").as("max_streak_days"),
        col("__start").as("streak_start"), col("__end").as("streak_end"),
        col("__ni").as("n_islands"),
        col("__tot").as("n_active_days")): _*)
  }

  /** 2-D skyline (Pareto frontier, Börzsönyi ICDE'01): the rows not
    * DOMINATED under (minimize x, maximize y) — e.g. "no other part is
    * both cheaper and larger". One sorted window over the DISTINCT
    * (x, y) grid: ordered by (x asc, y desc), a point survives iff its
    * y strictly exceeds every preceding point's (the running max) —
    * the textbook sort-filter skyline, then ids join back so co-located
    * duplicates all surface. The window rides distinct VALUE pairs
    * (grid-bounded — price×size, not row count); at a cardinality
    * where even that funnels, pre-filter with per-partition local
    * skylines first (the standard two-phase plan) — the global pass
    * here is the final merge either way.
    */
  def skyline2D(df: DataFrame, idCol: String, minCol: Column,
                maxCol: Column): DataFrame = {
    val pts = df.select(minCol.as("__x"), maxCol.as("__y")).distinct()
    val w = Window.orderBy(col("__x").asc, col("__y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = pts.withColumn("__my", max(col("__y")).over(w))
      .filter(col("__my").isNull || col("__y") > col("__my"))
      .drop("__my")
    df.select(col(idCol), minCol.as("__x"), maxCol.as("__y"))
      .join(sky, Seq("__x", "__y"))
      .select(col(idCol), col("__x").as("x"), col("__y").as("y"))
  }
}
