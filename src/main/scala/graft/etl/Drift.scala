package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Distribution-drift monitors — the checks a continuously-fed pipeline
  * runs between a reference window and the current window before
  * trusting (or training on) new data: PSI for binned feature drift,
  * two-sample Kolmogorov–Smirnov for distribution-shape drift.
  *
  * Both are one-pass keyed plans: the corpus never collects, per-key
  * state after aggregation is O(#bins) / O(#distinct values), and every
  * window partitions by the key so nothing global sorts.
  */
object Drift {

  /** Population Stability Index per key between the `isRef` rows and the
    * rest: `Σ (p_i − q_i)·ln(p_i / q_i)` over `bins` equal-width bins
    * whose range [lo, hi] comes from the REFERENCE side (the deployed
    * convention: the monitoring bins are fixed when the reference window
    * is; current-side outliers clamp into the edge bins). Add-half
    * smoothing keeps empty bins finite. Rule of thumb: < 0.1 stable,
    * 0.1–0.25 moderate, > 0.25 drifted.
    *
    * Shape: one agg for per-key ref ranges (O(#keys), broadcast back),
    * one keyed agg to (key, bin) counts with conditional sides — the
    * closing per-key windows ride rows already partitioned by key
    * (#keys × bins rows, no corpus-scale work after the second agg).
    */
  /** Equal-width bin id in [0, bins−1] for `value` against a frozen
    * [lo, hi] range — out-of-range values clamp into the edge bins; a
    * degenerate range (lo == hi) sends everything to bin 0 (PSI then
    * measures pure mass imbalance). Shared by the batch monitor and
    * [[graft.streaming.DriftStream]] so both sides of a streaming
    * comparison bin identically.
    */
  private[graft] def binId(value: Column, lo: Column, hi: Column,
                           bins: Int): Column = {
    val width = hi - lo
    val raw = when(width <= lit(0), lit(0))
      .otherwise(floor((value - lo) / width * bins))
    least(greatest(raw, lit(0)), lit(bins - 1)).cast("long")
  }

  /** The smoothed-PSI contribution of one bin row, from raw side counts
    * and per-key totals: `(p − q)·ln(p/q)` with add-half smoothing.
    */
  private[graft] def psiTerm(rc: Column, cc: Column, nr: Column, nc: Column,
                             bins: Int): Column = {
    val p = (rc + lit(0.5)) / (nr + lit(0.5) * bins)
    val q = (cc + lit(0.5)) / (nc + lit(0.5) * bins)
    (p - q) * log(p / q)
  }

  def psi(df: DataFrame, keys: Seq[String], valueCol: String, isRef: Column,
          bins: Int = 10, digits: Int = 6): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val keyCols = keys.map(col)
    val tagged = df.withColumn("__ref", isRef)
    val ranges = tagged.filter(col("__ref"))
      .groupBy(keyCols: _*)
      .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    val bin = binId(col(valueCol), col("__lo"), col("__hi"), bins)
    val counts = tagged.join(broadcast(ranges), keys)
      .withColumn("__bin", bin)
      .groupBy(keyCols :+ col("__bin"): _*)
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("__rc"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("__cc"))
    val w = Window.partitionBy(keyCols: _*)
    counts
      .withColumn("__term", psiTerm(col("__rc"), col("__cc"),
        sum(col("__rc")).over(w), sum(col("__cc")).over(w), bins))
      .withColumn("__nr", sum(col("__rc")).over(w))
      .withColumn("__nc", sum(col("__cc")).over(w))
      .groupBy(keyCols: _*)
      .agg(roundStable(sum(col("__term")), digits).as("psi"),
        max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cur"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per key between the `isA`
    * rows and the rest: `D = max_x |F_A(x) − F_B(x)|`, plus the
    * sample-size-scaled statistic `sqrt(n_a·n_b/(n_a+n_b))·D` (compare
    * to the K-S critical values: 1.36 ≈ α 0.05). Exact — both empirical
    * CDFs evaluate at every observed value, ties handled by grouping on
    * the value itself before the cumulative sums.
    *
    * Shape: one keyed agg to (key, value) with conditional side counts,
    * then per-key cumulative windows over those aggregated rows and a
    * closing per-key max that reuses the window's partitioning.
    */
  def ksTest(df: DataFrame, keys: Seq[String], valueCol: String, isA: Column,
             digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val counts = df
      .groupBy(keyCols :+ col(valueCol).as("__v"): _*)
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(!isA, 1L).otherwise(0L)).as("__cb"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val na = sum(col("__ca")).over(wAll)
    val nb = sum(col("__cb")).over(wAll)
    val diff = abs(
      sum(col("__ca")).over(wOrd).cast("double") / na.cast("double") -
      sum(col("__cb")).over(wOrd).cast("double") / nb.cast("double"))
    counts
      .withColumn("__d", diff)
      .withColumn("__na", na).withColumn("__nb", nb)
      .groupBy(keyCols: _*)
      .agg(roundStable(max(col("__d")), digits).as("ks_d"),
        roundStable(
          max(col("__d")) * sqrt(max(col("__na")).cast("double") *
            max(col("__nb")) / (max(col("__na")) + max(col("__nb")))),
          digits).as("ks_scaled"),
        max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"))
  }
}
