package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union ("gaps and islands"): collapse a set of per-key
  * [start, end] intervals into their maximal overlapping runs —
  * coverage windows from raw event horizons, maintenance windows from
  * overlapping tickets, downtime from alert spans.
  *
  * Intervals are CLOSED: a pair touching exactly end-to-start
  * ([1,5],[5,9]) merges. An island breaks where a row's start exceeds
  * the running max end of everything before it — the classic
  * sort-based sweep, expressed as two keyed windows plus one
  * aggregation.
  *
  * Scale shape: ONE shuffle total. Both windows partition by the key,
  * and the closing groupBy on (key, island) reuses that distribution —
  * `HashPartitioning(key)` satisfies the finer
  * `ClusteredDistribution(key, island)`, so Catalyst plans NO second
  * Exchange (spec-gated). Per-key data never collects to the driver
  * and islands stream through the sort — 100 TB of events with a
  * bounded per-key row count behaves like any keyed window.
  */
object Intervals {

  /** Merge overlapping/touching [startCol, endCol] intervals per key.
    * Returns keys ++ (start, end, n_rows) — one row per maximal island,
    * with `n_rows` counting the source intervals it absorbed.
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], startCol: String,
                     endCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isBreak = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
      .otherwise(0L)
    val island = sum(isBreak)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__island", island)
      .groupBy(keyCols :+ col("__island"): _*)
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_rows"))
      .drop("__island")
  }

  /** The complement: the gaps BETWEEN a key's islands — each output row
    * is a maximal uncovered span strictly inside the key's coverage
    * range. Derived from [[mergeIntervals]]; still one shuffle.
    */
  def gaps(df: DataFrame, keys: Seq[String], startCol: String,
           endCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(startCol))
    mergeIntervals(df, keys, startCol, endCol)
      .withColumn("__next_start", lead(col(startCol), 1).over(w))
      .filter(col("__next_start").isNotNull)
      .select(keyCols :+ col(endCol).as("gap_start") :+
        col("__next_start").as("gap_end"): _*)
  }

  /** Keyed interval-OVERLAP join — every (left, right) interval pair
    * that intersects, with the overlap duration: sessions hit by
    * incident windows, bookings against maintenance, exposure × outage.
    * The interval×interval sibling of [[graft.operators.RangeJoin]]'s
    * point-in-interval: a bare `aLo <= bHi AND bLo <= aHi` join plans
    * as a nested loop (the 100 TB cliff), so both sides explode onto a
    * time grid (`binMicros` cells over each interval's span) and the
    * join runs as an EQUI join on (keys, cell), exact predicate inside
    * the cell.
    *
    * An overlapping pair meets in EVERY shared cell — instead of a
    * distinct (a second corpus-scale shuffle), each pair is counted
    * only in ONE canonical cell: the one holding `max(aLo, bLo)` (the
    * overlap's left edge, which both sides cover by definition).
    * Map-side filter, no dedup shuffle. Closed-interval semantics
    * (touching endpoints overlap with `overlap_us = 0`, matching
    * [[mergeIntervals]]); pick `binMicros` near the typical span (the
    * RangeJoin sizing rule). Left/right columns survive with `_l`/`_r`
    * suffixes on the interval bounds.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  startCol: String, endCol: String,
                  binMicros: Long): DataFrame = {
    require(binMicros > 0, s"need binMicros > 0, got $binMicros")
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    // integer DIV, not fp division — a quotient rounding up at a cell
    // boundary would misplace the canonical cell (the RangeJoin rule)
    def side(df: DataFrame, tag: String) =
      df.filter(col(startCol) <= col(endCol))
        .select(keys.map(col) :+ col(startCol).as(s"start_$tag") :+
          col(endCol).as(s"end_$tag"): _*)
        .withColumn("__lo", us(col(s"start_$tag")))
        .withColumn("__hi", us(col(s"end_$tag")))
        .withColumn("__cell", explode(sequence(
          expr(s"__lo DIV ${binMicros}L"), expr(s"__hi DIV ${binMicros}L"))))
        .drop("__lo", "__hi")
    val l = side(left, "l")
    val r = side(right, "r")
    val loMax = greatest(us(col("start_l")), us(col("start_r")))
    val hiMin = least(us(col("end_l")), us(col("end_r")))
    l.join(r, keys :+ "__cell")
      .withColumn("__edge", loMax)
      .filter(loMax <= hiMin &&
        expr(s"__edge DIV ${binMicros}L") === col("__cell"))
      .select(keys.map(col) ++ Seq(col("start_l"), col("end_l"),
        col("start_r"), col("end_r"),
        (hiMin - loMax).as("overlap_us")): _*)
  }

  /** Total covered duration per key in `unit`-second units — the
    * de-overlapped "time on site" / uptime metric that a naive
    * sum(end - start) double-counts.
    */
  def coverage(df: DataFrame, keys: Seq[String], startCol: String,
               endCol: String): DataFrame = {
    val keyCols = keys.map(col)
    // cast("timestamp") is a no-op on TimestampType and re-anchors
    // TIMESTAMP_NTZ in the session zone — `unix_micros` rejects NTZ
    // input outright in Spark 4, and callers legitimately hold either.
    def us(c: String) = unix_micros(col(c).cast("timestamp"))
    mergeIntervals(df, keys, startCol, endCol)
      .groupBy(keyCols: _*)
      .agg(
        sum(us(endCol) - us(startCol)).as("covered_us"),
        count(lit(1)).as("n_islands"),
        sum(col("n_rows")).as("n_rows"))
  }

  /** Concurrency profile per key over [start, end] intervals — the
    * sweep-line census behind capacity questions ("how many sessions /
    * calls / jobs were open AT ONCE?"): peak concurrency, WHEN the
    * peak was first reached, and the TIME-WEIGHTED average level —
    * which a naive `n_intervals / span` gets wrong whenever intervals
    * overlap unevenly. Half-open [start, end) semantics: an interval
    * ending exactly when another starts does NOT overlap it — the −1
    * sorts before the +1 at the same instant (delta asc), which is
    * also what makes the sweep deterministic under ties.
    *
    * Shape: intervals explode to 2 boundary points, one keyed
    * (t, delta) window orders the sweep, the closing agg reuses its
    * partitioning — O(2·#intervals) rows after the explode, one
    * shuffle. Keys are the monitor's cohorts; pass `Nil` for a global
    * profile (then the single sort is the q204 documented trade).
    */
  def concurrency(df: DataFrame, keys: Seq[String], startCol: String,
                  endCol: String, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    def us(c: String) = unix_micros(col(c).cast("timestamp"))
    val points = df
      .select(keyCols :+ us(startCol).as("__t") :+ lit(1L).as("__d"): _*)
      .union(df.select(keyCols :+ us(endCol).as("__t") :+
        lit(-1L).as("__d"): _*))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__t"), col("__d"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val swept = points
      .withColumn("__lvl", sum(col("__d")).over(wCum))
      .withColumn("__next", lead(col("__t"), 1).over(wOrd))
      .withColumn("__max", max(col("__lvl")).over(wAll))
      .withColumn("__dur", (col("__next") - col("__t")).cast("double"))
    swept
      .groupBy(keyCols: _*)
      .agg(
        max(col("__lvl")).as("max_concurrency"),
        min(when(col("__lvl") === col("__max"), col("__t")))
          .as("__peak_us"),
        graft.functions.roundStable(
          when(max(col("__t")) > min(col("__t")),
            sum(col("__lvl") * col("__dur")) /
              (max(col("__t")) - min(col("__t"))).cast("double")), digits)
          .as("avg_concurrency"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .withColumn("peak_at", timestamp_micros(col("__peak_us")))
      .drop("__peak_us")
  }
}
