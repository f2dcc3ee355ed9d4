package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Operational SLO monitoring over event telemetry — the readouts an
  * on-call rotation actually pages on: multi-window error-budget burn
  * rate, incident segmentation with MTTR/MTBF, and Apdex. All three
  * reduce the raw stream to per-(key, hour) aggregates FIRST, so every
  * window and island pass rides calendar-bounded state — the 100 TB
  * event log is touched exactly once per operator.
  *
  * Reference anchor: the reference pipeline's validation stage gates a
  * day's batch on quality thresholds (dag:365-407); these are the
  * continuous-time equivalents for a serving system.
  */
object Slo {

  /** Multi-window error-budget burn rate (the Google SRE Workbook ch.5
    * alerting recipe): per (key, hour), the error rate over a SHORT
    * and a LONG trailing window, each expressed as a multiple of the
    * budget (`burn = rate/budget` — burn 1 spends exactly the budget,
    * burn 2 spends it in half the period). The ALERT fires only when
    * BOTH exceed `threshold`: the long window proves it's real, the
    * short window proves it's still happening — the pairing that kills
    * both flappy alerts and slow-burn misses. Range windows over the
    * hour INDEX (not row count — silent hours must widen the window,
    * not shrink it); hours with zero traffic in a window emit NULL
    * burn, never a 0-divide.
    */
  def burnRate(df: DataFrame, keys: Seq[String], tsCol: Column,
               isError: Column, budget: Double, shortHours: Int = 6,
               longHours: Int = 24, threshold: Double = 2.0,
               digits: Int = 6): DataFrame = {
    require(budget > 0 && budget < 1, s"need 0 < budget < 1, got $budget")
    require(shortHours >= 1 && longHours > shortHours,
      s"need 1 <= shortHours < longHours, got $shortHours/$longHours")
    val keyCols = keys.map(col)
    val hourly = df
      .groupBy(keyCols :+ date_trunc("hour", tsCol).as("__h"): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(when(isError, 1.0).otherwise(0.0)).as("__e"))
    burnFromHourly(hourly, keys, budget, shortHours, longHours,
      threshold, digits)
  }

  /** The burn computation over an already-hourly (keys, __h, __n, __e)
    * table — shared by [[burnRate]] and the streaming monitor
    * ([[graft.streaming.SloStream]]), whose state is exactly this
    * table accumulated across micro-batches.
    */
  private[graft] def burnFromHourly(hourly: DataFrame, keys: Seq[String],
                                    budget: Double, shortHours: Int,
                                    longHours: Int, threshold: Double,
                                    digits: Int): DataFrame = {
    val keyCols = keys.map(col)
    val indexed = hourly.withColumn("__hi",
      (unix_micros(col("__h")) / 3600000000L).cast("long"))
    def win(hours: Int) = Window.partitionBy(keyCols: _*)
      .orderBy(col("__hi"))
      .rangeBetween(-(hours - 1).toLong, 0L)
    def burn(hours: Int) = {
      val n = sum(col("__n")).over(win(hours))
      val e = sum(col("__e")).over(win(hours))
      when(n > 0, e / n / budget)
    }
    indexed
      .withColumn("burn_short", roundStable(burn(shortHours), digits))
      .withColumn("burn_long", roundStable(burn(longHours), digits))
      .select(keyCols ++ Seq(col("__h").as("hour"),
        col("__n").cast("long").as("n"),
        col("__e").cast("long").as("n_errors"),
        col("burn_short"), col("burn_long"),
        (coalesce(col("burn_short") > threshold, lit(false)) &&
          coalesce(col("burn_long") > threshold, lit(false)))
          .as("alert")): _*)
  }

  /** Incident segmentation + MTTR/MTBF per key: hours containing at
    * least one error collapse to incidents when closer than
    * `gapHours` (the variable-gap islands fold — a flag-on-big-gap
    * prefix sum, not the fixed `day − row_number` constant), then per
    * key the fleet numbers: incident count, MTTR (mean span from an
    * incident's first to last error hour, inclusive) and MTBF (mean
    * hours between consecutive incident STARTS — defined only with
    * ≥ 2 incidents, NULL otherwise, never a fake 0). B63 measures
    * presence runs; this measures FAILURE episodes with the
    * between-times an availability report needs. State is
    * O(#key × #error-hours).
    */
  def incidents(df: DataFrame, keys: Seq[String], tsCol: Column,
                isError: Column, gapHours: Int = 2,
                digits: Int = 6): DataFrame = {
    require(gapHours >= 1, s"need gapHours >= 1, got $gapHours")
    val keyCols = keys.map(col)
    val errHours = df.filter(isError)
      .select(keyCols :+ (unix_micros(date_trunc("hour", tsCol)) /
        3600000000L).cast("long").as("__hi"): _*)
      .distinct()
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__hi"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val marked = errHours
      .withColumn("__gap", col("__hi") - lag(col("__hi"), 1).over(wOrd))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapHours, 1L)
          .otherwise(0L))
      .withColumn("__inc", sum(col("__new")).over(wCum))
    val spans = marked.groupBy(keyCols :+ col("__inc"): _*)
      .agg(min(col("__hi")).as("__start"), max(col("__hi")).as("__end"))
      .withColumn("__dur", col("__end") - col("__start") + 1)
    val wInc = Window.partitionBy(keyCols: _*).orderBy(col("__start"))
    spans
      .withColumn("__between",
        col("__start") - lag(col("__start"), 1).over(wInc))
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_incidents"),
        roundStable(avg(col("__dur")), digits).as("mttr_hours"),
        roundStable(avg(col("__between")), digits).as("mtbf_hours"),
        sum(col("__dur")).cast("long").as("total_incident_hours"))
  }

  /** Apdex score per key (the Apdex Alliance standard): with a target
    * latency T, `(satisfied + tolerating/2) / n` where satisfied ≤ T
    * and tolerating ≤ 4T — the one-number user-experience summary
    * that, unlike a mean latency, a tail can't hide behind and,
    * unlike a p99, traffic mix can't game. One conditional aggregation
    * pass; NULL latencies are excluded from all three tallies (an
    * unmeasured request is not a satisfied one).
    */
  def apdex(df: DataFrame, keys: Seq[String], latencyCol: Column,
            t: Double, digits: Int = 6): DataFrame = {
    require(t > 0, s"need t > 0, got $t")
    val keyCols = keys.map(col)
    df.filter(latencyCol.isNotNull)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(latencyCol <= t, 1L).otherwise(0L)).as("n_satisfied"),
        sum(when(latencyCol > t && latencyCol <= 4 * t, 1L)
          .otherwise(0L)).as("n_tolerating"))
      .withColumn("apdex", roundStable(
        (col("n_satisfied") + col("n_tolerating").cast("double") / 2) /
          col("n"), digits))
  }
}
