package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Causal-inference primitives beyond A110's difference-in-differences:
  * instrumental variables (Wald), sharp regression discontinuity, and
  * the E-value sensitivity bound. Each is ONE conditional-moments
  * aggregation per key — the estimators are closed-form ratios of
  * cell means, so the 100 TB table reduces to a handful of numbers
  * before any arithmetic happens.
  *
  * Reference anchor: dag:365-407 (the validation/comparison stage
  * these estimators upgrade from descriptive to causal readouts).
  */
object Causal {

  /** Wald / instrumental-variable estimator (the encouragement-design
    * workhorse; Imbens & Angrist 1994's LATE interpretation): with a
    * random instrument z, `LATE = (E[y|z=1] − E[y|z=0]) /
    * (E[d|z=1] − E[d|z=0])` — the intent-to-treat effect rescaled by
    * the first stage (the complier share). The estimator for "we
    * could only RANDOMIZE THE NUDGE, not the treatment" — naive
    * treated-vs-untreated comparison is confounded by who chooses to
    * comply; Wald divides the confounding out. Weak instruments
    * (|first stage| below `minFirstStage`) emit NULL LATE with both
    * stages visible — a near-zero denominator manufactures arbitrarily
    * wild effects, the classic IV failure. One conditional agg.
    */
  def waldIv(df: DataFrame, keys: Seq[String], instrument: Column,
             treated: Column, outcome: Column,
             minFirstStage: Double = 0.01, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val y = outcome.cast("double")
    val st = df.filter(y.isNotNull).groupBy(keyCols: _*)
      .agg(sum(when(instrument, 1.0).otherwise(0.0)).as("__n1"),
        sum(when(instrument, y).otherwise(0.0)).as("__y1"),
        sum(when(instrument && treated, 1.0).otherwise(0.0)).as("__d1"),
        sum(when(!instrument, 1.0).otherwise(0.0)).as("__n0"),
        sum(when(!instrument, y).otherwise(0.0)).as("__y0"),
        sum(when(!instrument && treated, 1.0).otherwise(0.0)).as("__d0"))
    val ok = col("__n1") > 0 && col("__n0") > 0
    val itt = when(ok, col("__y1") / col("__n1") - col("__y0") / col("__n0"))
    val fs = when(ok, col("__d1") / col("__n1") - col("__d0") / col("__n0"))
    st.select(keyCols ++ Seq(
      col("__n1").cast("long").as("n_encouraged"),
      col("__n0").cast("long").as("n_control"),
      roundStable(itt, digits).as("itt"),
      roundStable(fs, digits).as("first_stage"),
      roundStable(when(abs(fs) >= minFirstStage, itt / fs), digits)
        .as("late")): _*)
  }

  /** Sharp regression discontinuity (Thistlethwaite & Campbell 1960;
    * the local-linear practice per Imbens & Lemieux 2008): within a
    * `bandwidth` of the cutoff, fit OLS of outcome on the CENTERED
    * running variable separately on each side — the jump between the
    * two intercepts AT the cutoff is the effect (one global line
    * would smuggle curvature across the boundary; separate slopes are
    * the whole point). Everything from per-side conditional moments
    * in ONE aggregation pass; sides with < 2 points or zero running
    * variance emit NULL (no line to extrapolate), and the jump is
    * NULL unless both sides fit.
    */
  def rdd(df: DataFrame, keys: Seq[String], runningCol: Column,
          outcomeCol: Column, cutoff: Double, bandwidth: Double,
          digits: Int = 6): DataFrame = {
    require(bandwidth > 0, s"need bandwidth > 0, got $bandwidth")
    val keyCols = keys.map(col)
    val x = runningCol.cast("double") - cutoff
    val y = outcomeCol.cast("double")
    val right = x >= 0
    def sideAgg(side: Column, tag: String) = Seq(
      sum(when(side, 1.0).otherwise(0.0)).as(s"__n$tag"),
      sum(when(side, x).otherwise(0.0)).as(s"__sx$tag"),
      sum(when(side, y).otherwise(0.0)).as(s"__sy$tag"),
      sum(when(side, x * x).otherwise(0.0)).as(s"__sxx$tag"),
      sum(when(side, x * y).otherwise(0.0)).as(s"__sxy$tag"))
    val aggs = sideAgg(!right, "l") ++ sideAgg(right, "r")
    val st = df.filter(y.isNotNull && abs(x) <= bandwidth)
      .groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
    def fit(tag: String): (Column, Column) = {
      val n = col(s"__n$tag"); val sx = col(s"__sx$tag")
      val sy = col(s"__sy$tag"); val sxx = col(s"__sxx$tag")
      val sxy = col(s"__sxy$tag")
      val den = n * sxx - sx * sx
      val b = when(n >= 2 && den > 0, (n * sxy - sx * sy) / den)
      val a = (sy - b * sx) / n
      (a, b)
    }
    val (al, bl) = fit("l"); val (ar, br) = fit("r")
    st.select(keyCols ++ Seq(
      col("__nl").cast("long").as("n_left"),
      col("__nr").cast("long").as("n_right"),
      roundStable(al, digits).as("left_at_cutoff"),
      roundStable(ar, digits).as("right_at_cutoff"),
      roundStable(bl, digits).as("slope_left"),
      roundStable(br, digits).as("slope_right"),
      roundStable(ar - al, digits).as("jump")): _*)
  }

  /** E-value (VanderWeele & Ding, Annals of Internal Medicine 2017) —
    * the sensitivity bound every observational risk ratio should ship
    * with: the MINIMUM strength of association an unmeasured
    * confounder would need with BOTH exposure and outcome to explain
    * the observed RR away — `E = RR + √(RR(RR−1))` (protective RRs
    * invert first, the standard convention). E = 3 means "a
    * confounder would need a 3× association on both arms", which a
    * reviewer can argue about concretely; RR = 1 gives E = 1 (no
    * association needs no explaining). Per key from one 2×2
    * conditional agg; empty arms or a zero baseline rate emit NULL.
    */
  def eValue(df: DataFrame, keys: Seq[String], exposed: Column,
             outcome: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val st = df.groupBy(keyCols: _*)
      .agg(sum(when(exposed, 1.0).otherwise(0.0)).as("__n1"),
        sum(when(exposed && outcome, 1.0).otherwise(0.0)).as("__x1"),
        sum(when(!exposed, 1.0).otherwise(0.0)).as("__n0"),
        sum(when(!exposed && outcome, 1.0).otherwise(0.0)).as("__x0"))
    val p1 = when(col("__n1") > 0, col("__x1") / col("__n1"))
    val p0 = when(col("__n0") > 0, col("__x0") / col("__n0"))
    val rr = when(p0 > 0 && p1 > 0, p1 / p0)
    val rrStar = when(rr >= 1, rr).otherwise(lit(1.0) / rr)
    st.select(keyCols ++ Seq(
      roundStable(p1, digits).as("p_exposed"),
      roundStable(p0, digits).as("p_unexposed"),
      roundStable(rr, digits).as("rr"),
      roundStable(rrStar + sqrt(rrStar * (rrStar - 1)), digits)
        .as("evalue")): _*)
  }
}
