package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Survival-analysis completion on top of [[Aggregates.kaplanMeier]] /
  * [[Aggregates.nelsonAalen]]: model evaluation (Harrell's C), the
  * scalar summaries a KM curve is read FOR (RMST, median survival),
  * and classical person-time epidemiology (incidence-rate ratio).
  * Subjects are expected already reduced to one row each (the q172
  * staging) — every operator here runs on O(#subjects) or
  * O(#distinct durations) state.
  *
  * Reference anchor: dag:365-407 (time-to-failure readouts over the
  * same event telemetry the reference validates batch-wise).
  */
object Survival {

  /** Harrell's concordance index (Harrell et al. JAMA 1982) — does a
    * risk SCORE order subjects' actual event times: over usable pairs
    * (the earlier subject's event observed), the share where the
    * earlier-failing subject carries the HIGHER score, ties at half
    * credit — the survival-world AUC (C = 0.5 is a coin flip). Scores
    * compare on 6dp-rounded values (deterministic tie set, both
    * engines). The pair join is O(#subjects²) per key — subjects are
    * the REDUCED table (one row per user, not per event); at a scale
    * where even that funnels, stratified sampling of pairs is the
    * standard estimate (documented, not silently done).
    */
  def cIndex(subjects: DataFrame, keys: Seq[String], durationCol: Column,
             observedCol: Column, scoreCol: Column,
             digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val base = subjects.select(keyCols :+ durationCol.as("__t") :+
      observedCol.as("__o") :+
      roundStable(scoreCol.cast("double"), digits).as("__s"): _*)
    val a = base.select(keyCols :+ col("__t").as("__ta") :+
      col("__o").as("__oa") :+ col("__s").as("__sa"): _*)
    val b = base.select(keyCols :+ col("__t").as("__tb") :+
      col("__s").as("__sb"): _*)
    val pairs = a.join(b, keys)
      .filter(col("__oa") && col("__ta") < col("__tb"))
    pairs.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__sa") > col("__sb"), 1.0)
          .when(col("__sa") === col("__sb"), 0.5)
          .otherwise(0.0)).as("__conc"))
      .select(keyCols ++ Seq(col("n_pairs"),
        roundStable(col("__conc") / col("n_pairs"), digits)
          .as("c_index")): _*)
  }

  /** Scalar KM summaries per key: restricted mean survival time
    * `RMST(τ) = ∫₀^τ S(t)dt` (the "average event-free days in the
    * first τ" number a hazard ratio can't give — Royston & Parmar
    * 2013's argument for reporting it) and the median survival time
    * (first t with S ≤ 0.5, NULL while the curve never crosses —
    * "median not reached", stated, never fabricated). The step
    * integral rides [[Aggregates.kaplanMeier]]'s O(#durations) rows:
    * head segment at S = 1 up to the first event time, each step
    * carried to the next (capped at τ); beyond the last observed time
    * S extends at its final value to τ — the standard convention,
    * honest only when τ is inside follow-up (caller's contract).
    */
  def survivalSummary(df: DataFrame, keys: Seq[String],
                      durationCol: String, observedCol: Column,
                      tau: Double, digits: Int = 6): DataFrame = {
    require(tau > 0, s"need tau > 0, got $tau")
    val keyCols = keys.map(col)
    val km = Aggregates.kaplanMeier(df, keys, durationCol, observedCol)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("t"))
    val t = col("t").cast("double")
    val nextT = coalesce(lead(col("t"), 1).over(wOrd).cast("double"),
      lit(tau))
    val seg = col("survival") *
      (least(nextT, lit(tau)) - least(t, lit(tau)))
    val first = col("__rn") === 1
    val head = when(first, least(t, lit(tau))).otherwise(0.0)
    km.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__seg", seg + head)
      .groupBy(keyCols: _*)
      .agg(roundStable(sum(col("__seg")), digits).as("rmst"),
        min(when(col("survival") <= 0.5, col("t"))).as("median_t"),
        max(col("t")).as("last_t"),
        min(col("survival")).as("s_last"))
      .withColumn("tau", lit(tau))
  }

  /** Incidence-rate ratio from person-time (classical epidemiology —
    * e.g. Rothman's Modern Epidemiology): per key, each cohort's
    * events over its summed follow-up time, the ratio, and the
    * log-scale 95% CI (`SE = √(1/d₁ + 1/d₀)` — the Poisson
    * large-sample form). Rates answer "per exposed day", which plain
    * proportions get WRONG when follow-up differs between cohorts —
    * exactly the A128 MTBF setting with denominators done right.
    * Zero-event or zero-time cohorts emit NULL ratio with both rates'
    * raw ingredients visible.
    */
  def rateRatio(df: DataFrame, keys: Seq[String], exposed: Column,
                durationCol: Column, observedCol: Column,
                digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val d = durationCol.cast("double")
    val st = df.groupBy(keyCols: _*)
      .agg(sum(when(exposed && observedCol, 1.0).otherwise(0.0))
          .as("__d1"),
        sum(when(exposed, d).otherwise(0.0)).as("__t1"),
        sum(when(!exposed && observedCol, 1.0).otherwise(0.0))
          .as("__d0"),
        sum(when(!exposed, d).otherwise(0.0)).as("__t0"))
    val r1 = when(col("__t1") > 0, col("__d1") / col("__t1"))
    val r0 = when(col("__t0") > 0, col("__d0") / col("__t0"))
    val irr = when(r0 > 0 && r1 > 0, r1 / r0)
    val se = when(col("__d1") > 0 && col("__d0") > 0,
      sqrt(lit(1.0) / col("__d1") + lit(1.0) / col("__d0")))
    st.select(keyCols ++ Seq(
      col("__d1").cast("long").as("events_exposed"),
      roundStable(col("__t1"), digits).as("time_exposed"),
      col("__d0").cast("long").as("events_unexposed"),
      roundStable(col("__t0"), digits).as("time_unexposed"),
      roundStable(irr, digits).as("irr"),
      roundStable(exp(log(irr) - lit(1.96) * se), digits)
        .as("ci_lo"),
      roundStable(exp(log(irr) + lit(1.96) * se), digits)
        .as("ci_hi")): _*)
  }
}
