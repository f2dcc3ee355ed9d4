package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Online-experimentation operators: always-valid sequential testing,
  * bandit arm scoring, and the assignment-integrity check every A/B
  * readout should be gated on. All three reduce the event stream to
  * per-(key, period/arm) cells first — windows ride calendar × arm
  * state, never raw volume.
  *
  * Reference anchor: the reference pipeline gates each batch on
  * validation thresholds (dag:365-407); these are the experiment-
  * integrity gates for the same decision loop.
  */
object Experiment {

  /** Two-sample mixture SPRT (mSPRT — Johari, Koomen, Pekelis & Walsh
    * KDD'17; the "always-valid p-value" behind Optimizely Stats
    * Engine): per key and day, the cumulative A-vs-B mean difference
    * with `Λ_n = √(V_n/(V_n+τ²)) · exp(δ̂²τ²/(2V_n(V_n+τ²)))` where
    * `V_n = σ̂²(1/n_A + 1/n_B)` (plug-in pooled variance — the
    * standard practice, documented), and the always-valid
    * `p_n = min(1, min_{m≤n} 1/Λ_m)` via a running max of Λ. Unlike a
    * fixed-horizon t-test, peeking at this p EVERY DAY never inflates
    * the false-positive rate — the "when could we have honestly
    * stopped" readout. τ is the prior scale on the effect size; thin
    * days (either arm < 2 cumulative, σ̂² = 0) emit NULL Λ and carry
    * the previous p forward through the running max — before ANY Λ
    * exists the always-valid p is trivially 1 (no evidence is not
    * significance), which `least`'s null handling yields for free.
    * One conditional daily agg + cumulative windows over
    * O(#keys × #days) rows.
    */
  def msprt(df: DataFrame, keys: Seq[String], tsCol: Column,
            isTreat: Column, valueCol: Column, tau: Double,
            digits: Int = 6): DataFrame = {
    require(tau > 0, s"need tau > 0, got $tau")
    val keyCols = keys.map(col)
    val v = valueCol.cast("double")
    val daily = df.filter(v.isNotNull)
      .groupBy(keyCols :+ to_date(tsCol).as("day"): _*)
      .agg(
        sum(when(isTreat, 1.0).otherwise(0.0)).as("__na"),
        sum(when(isTreat, v).otherwise(0.0)).as("__sa"),
        sum(when(isTreat, v * v).otherwise(0.0)).as("__qa"),
        sum(when(isTreat, 0.0).otherwise(1.0)).as("__nb"),
        sum(when(isTreat, 0.0).otherwise(v)).as("__sb"),
        sum(when(isTreat, 0.0).otherwise(v * v)).as("__qb"))
    val wCum = Window.partitionBy(keyCols: _*).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = daily
      .withColumn("__cna", sum(col("__na")).over(wCum))
      .withColumn("__csa", sum(col("__sa")).over(wCum))
      .withColumn("__cqa", sum(col("__qa")).over(wCum))
      .withColumn("__cnb", sum(col("__nb")).over(wCum))
      .withColumn("__csb", sum(col("__sb")).over(wCum))
      .withColumn("__cqb", sum(col("__qb")).over(wCum))
    val na = col("__cna"); val nb = col("__cnb")
    // an arm silent so far has no mean — NULL, never an ANSI 0/0
    val ma = when(na > 0, col("__csa") / na)
    val mb = when(nb > 0, col("__csb") / nb)
    val sig2 = (col("__cqa") - na * ma * ma +
      col("__cqb") - nb * mb * mb) / (na + nb - 2)
    val ok = na >= 2 && nb >= 2
    val vn = when(ok && sig2 > 0, sig2 * (lit(1.0) / na + lit(1.0) / nb))
    val delta = ma - mb
    val t2 = lit(tau * tau)
    val lam = sqrt(vn / (vn + t2)) *
      exp(delta * delta * t2 / (lit(2.0) * vn * (vn + t2)))
    val scored = c
      .withColumn("__delta", delta)
      .withColumn("__lam", lam)
      .withColumn("__maxlam", max(col("__lam")).over(wCum))
    scored.select(keyCols ++ Seq(col("day"),
      na.cast("long").as("n_treat"), nb.cast("long").as("n_control"),
      roundStable(col("__delta"), digits).as("delta"),
      roundStable(col("__lam"), digits).as("lambda"),
      roundStable(least(lit(1.0), lit(1.0) / col("__maxlam")), digits)
        .as("always_valid_p"),
      coalesce(lit(1.0) / col("__maxlam") < 0.05, lit(false))
        .as("significant")): _*)
  }

  /** Group-sequential interim monitoring with O'Brien–Fleming
    * boundaries (Jennison & Turnbull's tabulated two-sided α=0.05,
    * K=5 equally-spaced looks) — the SCHEDULED-looks standard beside
    * [[msprt]]'s peek-whenever monitor: a regulated analysis plan
    * pre-commits to K interim analyses; each compares the CUMULATIVE
    * Welch z against a boundary that spends alpha conservatively early
    * (4.88 at look 1 → 2.03 at the final look), so an early stop needs
    * overwhelming evidence but the final look costs almost nothing
    * extra. Boundary constants are pinned shared double literals (the
    * q253 z-constant discipline — neither engine computes an inverse
    * normal). Looks are equal TIME slices of each key's observed range
    * (int64-micros arithmetic, the q95 rule). Per (key, look):
    * cumulative arm counts, effect, z, the boundary, and the crossing
    * flag. Thin looks (an arm under 2 obs, or zero variance) emit NULL
    * z — never a fake verdict. One cell agg over O(keys × K) rows plus
    * cumulative windows on the same partitioning.
    */
  def groupSequential(df: DataFrame, keys: Seq[String], tsCol: Column,
                      isTreat: Column, valueCol: Column,
                      digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val c = welchLooks(df, keys, tsCol, isTreat, valueCol)
    val na = col("__cna"); val nb = col("__cnb")
    // O'Brien-Fleming two-sided 0.05, K=5 (Jennison & Turnbull)
    val boundary = when(col("look") === 1, 4.8769)
      .when(col("look") === 2, 3.3569)
      .when(col("look") === 3, 2.6803)
      .when(col("look") === 4, 2.2898)
      .otherwise(2.0310)
    c.select(keyCols ++ Seq(col("look"),
      na.cast("long").as("n_treat"), nb.cast("long").as("n_control"),
      roundStable(col("__ma") - col("__mb"), digits).as("delta"),
      roundStable(col("__z"), digits).as("z"),
      boundary.as("boundary"),
      coalesce(abs(roundStable(col("__z"), digits)) > boundary, lit(false))
        .as("crossed")): _*)
  }

  /** Shared interim-look machinery for [[groupSequential]] /
    * [[alphaSpending]]: 5 equal TIME slices of each key's observed
    * range (int64-micros arithmetic, the q95 rule), per-look arm cells,
    * cumulative Welch moments over the look ordering, and the
    * cumulative z (`__z`, NULL on thin/degenerate looks). Emits the
    * cumulative columns plus `__ma`/`__mb`.
    */
  private def welchLooks(df: DataFrame, keys: Seq[String], tsCol: Column,
                         isTreat: Column, valueCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val v = valueCol.cast("double")
    val wAll = Window.partitionBy(keyCols: _*)
    val t = unix_micros(tsCol)
    val based = df.filter(v.isNotNull)
      .withColumn("__tmin", min(t).over(wAll))
      .withColumn("__tmax", max(t).over(wAll))
      .withColumn("look", least(
        floor(lit(5.0) * (t - col("__tmin")).cast("double") /
          (col("__tmax") - col("__tmin") + 1).cast("double")).cast("long")
          + 1, lit(5L)))
    val cells = based
      .groupBy(keyCols :+ col("look"): _*)
      .agg(
        sum(when(isTreat, 1.0).otherwise(0.0)).as("__na"),
        sum(when(isTreat, v).otherwise(0.0)).as("__sa"),
        sum(when(isTreat, v * v).otherwise(0.0)).as("__qa"),
        sum(when(isTreat, 0.0).otherwise(1.0)).as("__nb"),
        sum(when(isTreat, 0.0).otherwise(v)).as("__sb"),
        sum(when(isTreat, 0.0).otherwise(v * v)).as("__qb"))
    val wCum = Window.partitionBy(keyCols: _*).orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = cells
      .withColumn("__cna", sum(col("__na")).over(wCum))
      .withColumn("__csa", sum(col("__sa")).over(wCum))
      .withColumn("__cqa", sum(col("__qa")).over(wCum))
      .withColumn("__cnb", sum(col("__nb")).over(wCum))
      .withColumn("__csb", sum(col("__sb")).over(wCum))
      .withColumn("__cqb", sum(col("__qb")).over(wCum))
    val na = col("__cna"); val nb = col("__cnb")
    val ma = when(na > 0, col("__csa") / na)
    val mb = when(nb > 0, col("__csb") / nb)
    val s2a = when(na >= 2, (col("__cqa") - na * ma * ma) / (na - 1))
    val s2b = when(nb >= 2, (col("__cqb") - nb * mb * mb) / (nb - 1))
    val vn = s2a / na + s2b / nb
    c.withColumn("__ma", ma).withColumn("__mb", mb)
      .withColumn("__z",
        when(na >= 2 && nb >= 2 && vn > 0, (ma - mb) / sqrt(vn)))
  }

  /** Upper normal tail `1 − Φ(x)` for x ≥ 0 via Abramowitz & Stegun
    * 26.2.17 (|error| < 7.5e-8) — plain literal arithmetic both engines
    * replicate exactly (neither computes a true inverse/CDF; the q253
    * pinned-constant discipline extended to a pinned APPROXIMATION).
    */
  private def phiUpper(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * x)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    lit(0.3989422804014327) * exp(lit(-0.5) * x * x) * poly
  }

  /** Lan–DeMets ALPHA-SPENDING interim monitoring (Lan & DeMets 1983)
    * — the flexible-schedule companion of [[groupSequential]]'s pinned
    * O'Brien–Fleming table: a spending FUNCTION α*(t) fixes how much
    * two-sided α=0.05 may be spent by information fraction t, and each
    * look consumes the increment. Both classic shapes per look:
    *
    *  - OBF-type:    α*(t) = 2·(1 − Φ(z₀.₀₂₅ / √t))  (conservative early)
    *  - Pocock-type: α*(t) = α·ln(1 + (e−1)·t)        (near-uniform)
    *
    * The crossing rule is the BONFERRONI spending variant: a look
    * fires when its cumulative-z two-sided p-value falls below that
    * look's INCREMENT α*(tₖ) − α*(tₖ₋₁) — conservative (it ignores the
    * positive correlation between looks that the exact Lan–DeMets
    * boundary exploits; the exact boundary needs multivariate-normal
    * recursion numerical integration, which neither engine can express
    * as relational arithmetic — recorded limitation, not an accident).
    * Total type-I spend is therefore ≤ α by construction. Φ rides
    * [[phiUpper]]; every spend/boundary value is emitted rounded so
    * the oracle recomputes the identical arithmetic. Looks are the
    * same 5 equal time slices as [[groupSequential]]; thin looks emit
    * NULL z/p and never a fake crossing.
    */
  def alphaSpending(df: DataFrame, keys: Seq[String], tsCol: Column,
                    isTreat: Column, valueCol: Column, alpha: Double = 0.05,
                    digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val c = welchLooks(df, keys, tsCol, isTreat, valueCol)
    val na = col("__cna"); val nb = col("__cnb")
    // z_{alpha/2} for two-sided 0.05 — pinned literal (q253 discipline)
    require(alpha == 0.05, "spending table pinned at two-sided 0.05")
    val z025 = 1.959964
    def obfSpent(t: Column): Column =
      lit(2.0) * phiUpper(lit(z025) / sqrt(t))
    def pocockSpent(t: Column): Column =
      lit(alpha) * log(lit(1.0) + lit(1.718281828459045) * t)
    val tk = col("look").cast("double") / 5.0
    val tprev = (col("look") - 1).cast("double") / 5.0
    val obfS = obfSpent(tk)
    val obfInc = obfS - when(col("look") === 1, 0.0).otherwise(obfSpent(tprev))
    val pocS = pocockSpent(tk)
    val pocInc = pocS - when(col("look") === 1, 0.0).otherwise(pocockSpent(tprev))
    val pTwo = lit(2.0) * phiUpper(abs(col("__z")))
    c.select(keyCols ++ Seq(col("look"),
      na.cast("long").as("n_treat"), nb.cast("long").as("n_control"),
      roundStable(col("__ma") - col("__mb"), digits).as("delta"),
      roundStable(col("__z"), digits).as("z"),
      roundStable(pTwo, digits).as("p_two"),
      roundStable(obfS, digits).as("obf_spent"),
      roundStable(obfInc, digits).as("obf_inc"),
      roundStable(pocS, digits).as("pocock_spent"),
      roundStable(pocInc, digits).as("pocock_inc"),
      coalesce(roundStable(pTwo, digits) < roundStable(obfInc, digits),
        lit(false)).as("crossed_obf"),
      coalesce(roundStable(pTwo, digits) < roundStable(pocInc, digits),
        lit(false)).as("crossed_pocock")): _*)
  }

  /** UCB1 arm scores (Auer, Cesa-Bianchi & Fischer 2002) — per key,
    * each arm's empirical success rate plus the exploration bonus
    * `√(2 ln N / n)` and WHICH arm the policy would pull next (argmax
    * on the rounded score, arm tiebreak). Rewards must live in [0, 1]
    * — pass a boolean success column; the bonus is exactly why a
    * rarely-tried arm can outrank a well-measured better one (the
    * optimism that makes the regret bound work). One cell agg; the
    * argmax rides O(#arms) rows per key.
    */
  def ucb1(df: DataFrame, keys: Seq[String], armCol: Column,
           isSuccess: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df.groupBy(keyCols :+ armCol.as("arm"): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(when(isSuccess, 1.0).otherwise(0.0)).as("__x"))
    val wKey = Window.partitionBy(keyCols: _*)
    val scored = cells
      .withColumn("__nn", sum(col("__n")).over(wKey))
      .withColumn("__ucb", roundStable(col("__x") / col("__n") +
        sqrt(lit(2.0) * log(col("__nn")) / col("__n")), digits))
    val wBest = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ucb").desc, col("arm"))
    scored
      .withColumn("__rk", row_number().over(wBest))
      .select(keyCols ++ Seq(col("arm"),
        col("__n").cast("long").as("n"),
        roundStable(col("__x") / col("__n"), digits).as("mean"),
        col("__ucb").as("ucb"),
        (col("__rk") === 1).as("would_pull")): _*)
  }

  /** Sample-ratio mismatch check (the #1 A/B integrity gate — e.g.
    * Fabijan et al. 2019's SRM taxonomy): per key, the chi-square
    * goodness-of-fit of observed arm counts against the DESIGNED
    * split, with per-arm Pearson residuals so the broken arm is
    * named, not just detected. An SRM means assignment, logging, or
    * filtering is biased — every downstream effect estimate is
    * garbage until it's explained; the canonical alert threshold is
    * p < 0.001 (χ²₁ > 10.83 for two arms), left to the caller. Arms
    * absent from the data still emit (expected > 0, observed 0 — the
    * loudest row); arms in the data but NOT in the design are outside
    * the GOF's jurisdiction and excluded (documented — totals and
    * expected counts are over DESIGN arms only).
    */
  def srm(df: DataFrame, keys: Seq[String], armCol: Column,
          expected: Seq[(String, Double)], digits: Int = 6): DataFrame = {
    require(expected.nonEmpty && expected.forall(_._2 > 0) &&
      math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      s"expected fractions must be > 0 and sum to 1: $expected")
    val keyCols = keys.map(col)
    val spark = df.sparkSession
    import spark.implicits._
    val design = expected.toDF("arm", "__frac")
    val obs = df.groupBy(keyCols :+ armCol.cast("string").as("arm"): _*)
      .agg(count(lit(1)).cast("double").as("__o"))
    val wKey = Window.partitionBy(keyCols: _*)
    val grid = obs.select(keyCols: _*).distinct()
      .crossJoin(broadcast(design))
    val full = grid.join(obs, keys :+ "arm", "left")
      .withColumn("__o", coalesce(col("__o"), lit(0.0)))
      .withColumn("__n", sum(col("__o")).over(wKey))
      .withColumn("__e", col("__frac") * col("__n"))
      .withColumn("__res", (col("__o") - col("__e")) / sqrt(col("__e")))
    full
      .withColumn("chi2",
        roundStable(sum(col("__res") * col("__res")).over(wKey), digits))
      .select(keyCols ++ Seq(col("arm"),
        col("__o").cast("long").as("observed"),
        roundStable(col("__e"), digits).as("expected"),
        roundStable(col("__res"), digits).as("pearson_residual"),
        col("chi2")): _*)
  }
}
