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

  /** Covariate-shift importance weights per (key, bin) — the CURE to
    * the drift [[psi]] diagnoses: when the current window's feature
    * distribution q has shifted from the reference p, rows reweighted
    * by `w = p/q` (density ratio, binned) make current-window averages
    * estimate REFERENCE-window expectations again (Shimodaira 2000) —
    * train-on-fresh-data-as-if-reference without discarding it. Same
    * frozen-reference binning and add-half smoothing as [[psi]]
    * (smoothing caps the weight a near-empty current bin can get —
    * unbounded importance weights are how reweighting blows up
    * variance). One (key, bin) aggregation; apply by binning new rows
    * against the SAME ranges (emitted per row) and joining on
    * (keys, bin). Only observed bins emit — an unobserved bin has no
    * rows to weight.
    */
  def densityRatio(df: DataFrame, keys: Seq[String], valueCol: String,
                   isRef: Column, bins: Int = 10,
                   digits: Int = 6): DataFrame = {
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
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("__cc"),
        min(col("__lo")).as("lo"), min(col("__hi")).as("hi"))
    val w = Window.partitionBy(keyCols: _*)
    val p = (col("__rc") + lit(0.5)) /
      (sum(col("__rc")).over(w) + lit(0.5) * bins)
    val q = (col("__cc") + lit(0.5)) /
      (sum(col("__cc")).over(w) + lit(0.5) * bins)
    counts
      .withColumn("weight", roundStable(p / q, digits))
      .select(keyCols ++ Seq(col("__bin").as("bin"), col("__rc").as("ref_n"),
        col("__cc").as("cur_n"), col("lo"), col("hi"), col("weight")): _*)
  }

  /** PSI over EQUAL-FREQUENCY (reference-decile) bins — the variant
    * risk teams actually standardize on: [[psi]]'s equal-width bins let
    * one outlier stretch the range until all mass piles into two bins
    * (drift hides); decile edges from the REFERENCE give every bin
    * ~10% of reference mass by construction, so the statistic watches
    * the distribution's body. Edges are exact lower order statistics
    * at ranks `ceil(k·n/bins)` (deterministic, engine-replayable — no
    * interpolation); a current value's bin = #edges < value, clamped
    * by construction to [0, bins−1] since only bins−1 interior edges
    * exist. Shape: one keyed rank window over the REF side narrows to
    * bins−1 edge rows per key (collected to a per-key ARRAY — O(bins),
    * broadcast-friendly), then binning is a map-side HOF over that
    * array and the counting agg is the [[psi]] shape. Identical
    * add-half smoothing.
    */
  def psiQuantileBins(df: DataFrame, keys: Seq[String], valueCol: String,
                      isRef: Column, bins: Int = 10,
                      digits: Int = 6): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val keyCols = keys.map(col)
    val tagged = df.withColumn("__ref", isRef)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(keyCols: _*)
    val ref = tagged.filter(col("__ref"))
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
    // interior edge k (1..bins-1) sits at rank ceil(k*n/bins); integer
    // arithmetic: ceil(a/b) = (a + b - 1) DIV b
    val isEdge = (1 until bins).map { k =>
      col("__rn") === expr(s"(__n * $k + ${bins - 1}) DIV ${bins}L")
    }.reduce(_ || _)
    val edges = ref.filter(isEdge)
      .groupBy(keyCols: _*)
      .agg(array_sort(collect_set(col(valueCol))).as("__edges"))
    val bin = aggregate(col("__edges"), lit(0L),
      (acc, e) => acc + when(col(valueCol) > e, 1L).otherwise(0L))
    val counts = tagged.join(broadcast(edges), keys)
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

  /** Two-sided CUSUM change-point monitor per key — the third member of
    * the drift family: [[psi]]/[[ksTest]] say THAT a window drifted,
    * CUSUM localizes WHEN the shift began and alarms online. Reference
    * mean/σ come from the `isRef` rows; over the (orderCol, tieCol)-
    * ordered current series the standard upper CUSUM
    * `S_t = max(0, S_{t−1} + (z_t − slack))` accumulates evidence of an
    * UPWARD mean shift and the symmetric lower CUSUM
    * `T_t = max(0, T_{t−1} + (−z_t − slack))` of a DOWNWARD one (sensor
    * degradation / silent scale loss — invisible to the upper side);
    * both alarm at `> h` (Page 1954; slack k=0.5, h=5 detect ~1σ
    * shifts).
    *
    * The recursion LOOKS like a sequential fold, but has the closed
    * form `S_t = P_t − min(0, min_{j≤t} P_j)` over prefix sums
    * `P_t = Σ (z_i − slack)` — a running-drawdown identity — so each
    * side is TWO cumulative windows over the SAME keyed sort (the lower
    * side substitutes −z; one shuffle total), no collect, no UDF,
    * exactly replayable in SQL. Output per key: upper alarm count /
    * first alarm / peak (`n_alarms`, `first_alarm_at`, `max_s`), the
    * lower-side triple (`…_lo`), and `n_cur`.
    *
    * Keys whose reference σ is 0 or undefined (constant or single-row
    * reference) have no scale to standardize against: they are emitted
    * with NULL statistics and their `n_cur` — visible as
    * "unmonitorable", not silently absent (a flat-reference sensor is
    * exactly the one you want flagged). Keys with no reference rows at
    * all are not monitored (inner join) — there is no baseline to
    * compare against.
    */
  def cusum(df: DataFrame, keys: Seq[String], valueCol: String,
            orderCol: Column, tieCol: Column, isRef: Column,
            slack: Double = 0.5, h: Double = 5.0,
            digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val stats = df.filter(isRef)
      .groupBy(keyCols: _*)
      .agg(avg(col(valueCol)).as("__mu"), stddev_samp(col(valueCol)).as("__sd"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL for σ≤0 keys: every downstream window/aggregate folds to NULL
    // for the whole key (sum-over-all-nulls is NULL; Spark's `least`
    // skips nulls, so the drawdown floor stays 0.0 and NULL − 0.0 = NULL)
    val z = when(col("__sd") > 0,
      (col(valueCol) - col("__mu")) / col("__sd"))
    val xu = z - lit(slack)
    val xl = -z - lit(slack)
    // both prefix sums in ONE Window node, both running mins in a second
    // (same spec, adjacent projections collapse); the shared keyed sort
    // is shuffled and sorted once
    val cur = df.filter(!isRef).join(broadcast(stats), keys)
      .withColumn("__pu", sum(xu).over(wOrd))
      .withColumn("__pl", sum(xl).over(wOrd))
      .withColumn("__su", col("__pu") - least(min(col("__pu")).over(wOrd), lit(0.0)))
      .withColumn("__sl", col("__pl") - least(min(col("__pl")).over(wOrd), lit(0.0)))
    cur
      .withColumn("__au", (col("__su") > h).cast("long"))
      .withColumn("__al", (col("__sl") > h).cast("long"))
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__au")).as("n_alarms"),
        min(when(col("__au") === 1, orderCol)).as("first_alarm_at"),
        roundStable(max(col("__su")), digits).as("max_s"),
        sum(col("__al")).as("n_alarms_lo"),
        min(when(col("__al") === 1, orderCol)).as("first_alarm_lo_at"),
        roundStable(max(col("__sl")), digits).as("max_s_lo"),
        count(lit(1)).as("n_cur"))
  }

  /** Page–Hinkley test per key (Page 1954; the Gama et al. 2004 form
    * the concept-drift literature standardizes on) — the SELF-REFERENCED
    * member of the sequential family: [[cusum]] needs a calibrated
    * reference window (μ, σ); PH tracks deviations from the series'
    * OWN running mean, so it monitors a stream with no baseline at all
    * — the cold-start monitor, at the price of absolute (not σ-scaled)
    * thresholds. Upper side: `m_t = Σ_{i≤t}(x_i − x̄_{1..i} − δ)`,
    * alarm when `m_t − min_{j≤t} m_j > λ`; lower side symmetric over
    * `(x̄_{1..i} − x_i − δ)`. All three per-row series (running mean,
    * prefix sum, running min) ride ONE keyed sort — the [[cusum]]
    * plan shape with one extra cumulative window.
    *
    * Output per key: alarm count / first alarm / peak statistic for
    * both sides, plus n. δ and λ are in the VALUE's units (stated —
    * that is the no-reference trade).
    */
  def pageHinkley(df: DataFrame, keys: Seq[String], valueCol: String,
                  orderCol: Column, tieCol: Column,
                  delta: Double = 0.005, lambda: Double = 50.0,
                  digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumMean = avg(col(valueCol)).over(wCum)
    val staged = df
      .withColumn("__mu", cumMean)
      .withColumn("__mup",
        sum(col(valueCol) - col("__mu") - lit(delta)).over(wCum))
      .withColumn("__mlo",
        sum(col("__mu") - col(valueCol) - lit(delta)).over(wCum))
      .withColumn("__php", col("__mup") - min(col("__mup")).over(wCum))
      .withColumn("__phl", col("__mlo") - min(col("__mlo")).over(wCum))
    staged
      .withColumn("__au", (col("__php") > lambda).cast("long"))
      .withColumn("__al", (col("__phl") > lambda).cast("long"))
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__au")).as("n_alarms"),
        min(when(col("__au") === 1, orderCol)).as("first_alarm_at"),
        roundStable(max(col("__php")), digits).as("max_ph"),
        sum(col("__al")).as("n_alarms_lo"),
        min(when(col("__al") === 1, orderCol)).as("first_alarm_lo_at"),
        roundStable(max(col("__phl")), digits).as("max_ph_lo"),
        count(lit(1)).as("n"))
  }

  /** Pettitt changepoint test per key (Pettitt 1979) — WHERE did the
    * series shift, rank-based so it needs no σ estimate and no reference
    * window (the complement of [[cusum]], which needs a calibrated
    * baseline and answers "has it shifted by now"): the statistic
    * `U_t = Σ_{i≤t} Σ_{j>t} sign(x_i − x_j)` is maximized at the most
    * probable split, with the approximate significance
    * `p ≈ 2·exp(−6K²/(n³+n²))`, K = max|U_t|.
    *
    * The double sum LOOKS O(n²) but collapses through midranks:
    * `U_t = 2·W_t − t·(n+1)` where `W_t` is the prefix sum (in TIME
    * order) of the average ranks (in VALUE order) — tie-exact, because
    * midranks make `Σ sign` over a tie group vanish exactly as the
    * direct formula does. So: one keyed agg to the per-`bucketCol` mean
    * series, then rank + peer-count windows (value sort) and a prefix
    * window (time sort) all over the SAME key partitioning — one
    * shuffle after the agg, nothing quadratic, exactly replayable in
    * SQL. The last point is excluded from the argmax (U_n ≡ 0 by
    * construction — "change after everything" is not a split).
    *
    * Output per key: `change_at` (last bucket of the pre-shift segment;
    * earliest-bucket tiebreak on equal |U|), `k_stat`, `p_value`
    * (clamped to ≤ 1), `n_buckets`. Keys with < 3 buckets emit NULL
    * statistics (no interior split to test) with their count — visible,
    * not dropped.
    */
  def pettitt(df: DataFrame, keys: Seq[String], bucketCol: Column,
              valueCol: String, digits: Int = 6,
              seriesDigits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    // the bucket means are ROUNDED before ranking: rank ties must be
    // decided identically by every engine that replays this, and raw
    // double averages differ across summation orders by ulps — enough
    // to swap two near-equal days' integer ranks and shift U_t by ±2
    val series = df
      .groupBy(keyCols :+ bucketCol.as("__b"): _*)
      .agg(roundStable(avg(col(valueCol)), seriesDigits).as("__v"))
    val wVal = Window.partitionBy(keyCols: _*).orderBy(col("__v"))
    val wPeers = wVal.rangeBetween(Window.currentRow, Window.currentRow)
    val midrank = rank().over(wVal).cast("double") +
      (count(lit(1)).over(wPeers).cast("double") - 1) / 2
    val wTime = Window.partitionBy(keyCols: _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(keyCols: _*)
    val wPrefix = wTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = series
      .withColumn("__r", midrank)
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__t", row_number().over(wTime).cast("double"))
      .withColumn("__u", lit(2.0) * sum(col("__r")).over(wPrefix) -
        col("__t") * (col("__n") + 1))
      // interior splits only; a 1-bucket key keeps its sole row so the
      // key still surfaces (with NULL statistics) instead of vanishing
      .filter(col("__t") < col("__n") || col("__n") === 1)
    val wBest = Window.partitionBy(keyCols: _*)
      .orderBy(abs(col("__u")).desc, col("__b"))
    val nD = col("__n").cast("double")
    val k = abs(col("__u"))
    ranked
      .withColumn("__rk", row_number().over(wBest))
      .filter(col("__rk") === 1)
      .select(keyCols ++ Seq(
        when(col("__n") >= 3, col("__b")).as("change_at"),
        roundStable(when(col("__n") >= 3, k), digits).as("k_stat"),
        roundStable(when(col("__n") >= 3,
          least(lit(2.0) * exp(lit(-6.0) * k * k / (nD * nD * nD + nD * nD)),
            lit(1.0))), digits).as("p_value"),
        col("__n").as("n_buckets")): _*)
  }

  /** Benjamini–Hochberg FDR adjustment (Benjamini & Hochberg 1995) over
    * a battery of p-values — the multiple-testing control every keyed
    * monitor in this family NEEDS at fleet scale: scanning 10,000
    * sensors with [[pettitt]]/[[ksTest]] at α = 0.05 hands you ~500
    * false alarms by construction; BH caps the FALSE DISCOVERY RATE of
    * the whole battery instead. `q_i = min_{j ≥ i}(p_(j) · m / j)`
    * clamped at 1 (the step-up suffix minimum), reject where
    * `q ≤ alpha`.
    *
    * Input is one row per hypothesis (a monitor's per-key output), so
    * the battery is O(#keys) — key-count-sized, never data-sized. The
    * rank and suffix-min windows are deliberately GLOBAL (the whole
    * point is one ordered pass over the battery): a single-partition
    * window over ≤ #keys rows, the [[graft.operators.Skew.skewReport]]
    * bounded-window convention. NULL p-values (unmonitorable keys
    * upstream — the σ=0 convention) pass through unranked and
    * never rejected, visible to the end.
    */
  def bhAdjust(df: DataFrame, idCols: Seq[String], pCol: String,
               alpha: Double = 0.05, digits: Int = 6): DataFrame = {
    val ids = idCols.map(col)
    val live = df.filter(col(pCol).isNotNull)
    val wRank = Window.orderBy(col(pCol) +: ids: _*)
    val wSuffix = Window.orderBy((col(pCol) +: ids).map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val adjusted = live
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("q_value", roundStable(least(
        min(col(pCol) * col("__m") / col("rank")).over(wSuffix),
        lit(1.0)), digits))
      .withColumn("rejected", col("q_value") <= alpha)
      .drop("__m")
    val nulls = df.filter(col(pCol).isNull)
      .withColumn("rank", lit(null).cast("long"))
      .withColumn("q_value", lit(null).cast("double"))
      .withColumn("rejected", lit(false))
    adjusted.unionByName(nulls)
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, plus Cramér's V (the [0,1]-normalized effect size) — the
    * categorical complement of [[psi]]/[[ksTest]]: is the `b` mix the
    * same across `a` levels (lang across sources, event mix across
    * cohorts)? `chi2 = Σ (o − e)²/e` over the contingency cells with
    * `e = rowTotal·colTotal/n`; `V = sqrt(chi2 / (n·(min(r,c)−1)))`.
    *
    * Shape: ONE (a, b) count agg — the contingency table, O(r·c) rows —
    * then marginals ride two windows over those aggregated rows and one
    * closing global agg. Nothing row-scale survives the first shuffle.
    * Structural-zero cells contribute nothing to the windows' marginals
    * and (correctly) nothing to chi2: `Σ (o−e)²/e` over ABSENT cells
    * would need a dense cross of levels, but those cells' o=0 terms sum
    * to `e`, accounted via the identity `chi2 = n·(Σ o²/(rt·ct) − 1)`
    * which needs only OBSERVED cells.
    */
  /** Global (unkeyed) convenience form: one row for the whole frame. */
  def chiSquareIndep(df: DataFrame, aCol: String, bCol: String): DataFrame =
    chiSquareIndep(df, Nil, aCol, bCol)

  /** Keyed form — one test per key group, matching the rest of the drift
    * family's convention (is the lang×length association the same in
    * every source? run all sources in ONE pass). `keys = Nil` is the
    * global test. A key group where either categorical is constant has
    * no independence question to ask (dof 0): `cramers_v` is NULL there
    * rather than a 0/0 artifact.
    */
  def chiSquareIndep(df: DataFrame, keys: Seq[String], aCol: String,
                     bCol: String, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df
      .groupBy(keyCols :+ col(aCol).as("__a") :+ col(bCol).as("__b"): _*)
      .agg(count(lit(1)).cast("double").as("__o"))
    val wa = Window.partitionBy(keyCols :+ col("__a"): _*)
    val wb = Window.partitionBy(keyCols :+ col("__b"): _*)
    val withMargins = cells
      .withColumn("__rt", sum(col("__o")).over(wa))
      .withColumn("__ct", sum(col("__o")).over(wb))
    withMargins
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__o")).as("__n"),
        sum(col("__o") * col("__o") / (col("__rt") * col("__ct"))).as("__s"),
        countDistinct(col("__a")).as("__r"),
        countDistinct(col("__b")).as("__c"))
      .select(keyCols ++ Seq(
        roundStable((col("__s") - lit(1.0)) * col("__n"), digits).as("chi2"),
        ((col("__r") - 1) * (col("__c") - 1)).as("dof"),
        roundStable(
          when(least(col("__r"), col("__c")) > 1,
            sqrt((col("__s") - lit(1.0)) /
              (least(col("__r"), col("__c")) - lit(1)).cast("double"))),
          digits).as("cramers_v"),
        col("__n").cast("long").as("n")): _*)
  }

  /** Event-RATE shift monitor per key — the drift family's volume axis
    * (PSI/KS/CUSUM watch the VALUES; a dead sensor or a runaway
    * producer shifts the COUNT): compare each key's events-per-hour
    * between the reference and current windows under the Poisson model.
    * `z = (C_cur − λ·H_cur) / sqrt(λ·H_cur)` where `λ = C_ref / H_ref`
    * is the key's reference hourly rate and the hour spans come from
    * the GLOBAL window extents (max−min timestamp per window, shared by
    * all keys — a key silent in the current window still spans it, which
    * is exactly how a collapse to zero becomes a large negative z; |z| >
    * 3 ≈ p<0.003 under stable rate). `rate_ratio` is the plain
    * cur/ref rate quotient for readability.
    *
    * Shape: two one-row window-extent aggs broadcast via cross join +
    * one keyed conditional-count agg — O(#keys) state, no windows, no
    * sort; keys with zero reference events are emitted with NULL z (no
    * baseline rate — the cusum σ=0 convention).
    */
  def rateShift(df: DataFrame, keys: Seq[String], tsCol: Column,
                isRef: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val spanHours = (side: Column) =>
      ((unix_micros(max(when(side, tsCol))) -
        unix_micros(min(when(side, tsCol)))).cast("double") / 3.6e9)
    val spans = df.agg(
      spanHours(isRef).as("__hr"),
      spanHours(!isRef).as("__hc"))
    val counts = df.groupBy(keyCols: _*)
      .agg(sum(when(isRef, 1L).otherwise(0L)).as("__cr"),
        sum(when(!isRef, 1L).otherwise(0L)).as("__cc"))
    val lam = col("__cr") / col("__hr")
    val expect = lam * col("__hc")
    val ok = col("__cr") > 0 && col("__hr") > 0 && col("__hc") > 0
    counts.crossJoin(broadcast(spans))
      .select(keyCols ++ Seq(
        roundStable(when(col("__hr") > 0, lam), digits).as("ref_rate"),
        roundStable(when(col("__hc") > 0, col("__cc") / col("__hc")),
          digits).as("cur_rate"),
        roundStable(when(ok, col("__cc") / expect), digits)
          .as("rate_ratio"),
        roundStable(when(ok, (col("__cc") - expect) / sqrt(expect)),
          digits).as("poisson_z"),
        col("__cr").as("n_ref"), col("__cc").as("n_cur")): _*)
  }

  /** Jensen-Shannon divergence per key between the `isRef` and current
    * windows — the BOUNDED, SYMMETRIC member of the divergence family
    * ([[psi]] is unbounded and blows up on vanishing bins; JSD lives in
    * [0, ln 2] and is the square of a proper metric — the right number
    * to THRESHOLD uniformly across thousands of keys or feed a
    * downstream model): `JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m)` with
    * `m = (p+q)/2`, over the [[psi]] binning convention (reference
    * window freezes the per-key ranges, add-half smoothing; a bin
    * observed on neither side has p = q and contributes exactly 0, so
    * the observed-bins-only aggregation is exact). Same scale shape as
    * psi: one keyed conditional-count agg + one O(bins) window.
    */
  def jsd(df: DataFrame, keys: Seq[String], valueCol: String, isRef: Column,
          bins: Int = 10, digits: Int = 6): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val keyCols = keys.map(col)
    val tagged = df.withColumn("__ref", isRef)
    val ranges = tagged.filter(col("__ref"))
      .groupBy(keyCols: _*)
      .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    val counts = tagged.join(broadcast(ranges), keys)
      .withColumn("__bin", binId(col(valueCol), col("__lo"), col("__hi"), bins))
      .groupBy(keyCols :+ col("__bin"): _*)
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("__rc"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("__cc"))
    val w = Window.partitionBy(keyCols: _*)
    val p = (col("__rc") + lit(0.5)) / (sum(col("__rc")).over(w) + lit(0.5) * bins)
    val q = (col("__cc") + lit(0.5)) / (sum(col("__cc")).over(w) + lit(0.5) * bins)
    val m = (p + q) / 2
    counts
      .withColumn("__term", (p * log(p / m) + q * log(q / m)) / 2)
      .withColumn("__nr", sum(col("__rc")).over(w))
      .withColumn("__nc", sum(col("__cc")).over(w))
      .groupBy(keyCols: _*)
      .agg(roundStable(sum(col("__term")), digits).as("jsd"),
        max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cur"))
  }

  /** Benford first-significant-digit conformance per key — the
    * fabricated-data / instrument-fault screen: naturally occurring
    * multi-scale magnitudes put digit d first with probability
    * log10(1 + 1/d); uniform or hand-entered values don't. Emits the
    * chi-square distance to the Benford expectation and the observed
    * digit count (negatives contribute their magnitude; zeros are
    * excluded — no significant digit).
    *
    * The first digit is pure arithmetic (`floor(v / 10^floor(log10 v))`
    * — codegen'd, no string formatting); one keyed digit-count agg, the
    * closing per-key roll-up rides a window over ≤ 9 rows per key.
    */
  def benford(df: DataFrame, keys: Seq[String], valueCol: String,
              digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val v = abs(col(valueCol))
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("long")
    val counts = df.filter(v > 0)
      .withColumn("__d", digit)
      .groupBy(keyCols :+ col("__d"): _*)
      .agg(count(lit(1)).cast("double").as("__o"))
    val w = Window.partitionBy(keyCols: _*)
    // expected mass of ABSENT digits still contributes (0−e)²/e = e·n;
    // fold it in via  chi2 = Σ_observed (o−e)²/e + n·Σ_absent p_d —
    // equivalently n·(Σ_all p) − n·(Σ_obs p) added to the observed terms
    val pd = log(lit(1.0) + lit(1.0) / col("__d")) / log(lit(10.0))
    counts
      .withColumn("__n", sum(col("__o")).over(w))
      .withColumn("__e", pd * col("__n"))
      .groupBy(keyCols: _*)
      .agg(
        roundStable(
          sum((col("__o") - col("__e")) * (col("__o") - col("__e")) / col("__e")) +
            (max(col("__n")) - sum(col("__e"))),
          digits).as("benford_chi2"),
        max(col("__n")).cast("long").as("n"),
        count(lit(1)).as("n_digits_seen"))
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

  /** Exact 1-D Wasserstein-1 (earth-mover) distance per key between the
    * `isRef` rows and the rest — the drift family's MAGNITUDE axis:
    * [[ksTest]] reads the worst single CDF gap (a sup — one bad point
    * decides it) and [[psi]] reads binned mass ratios (unit-free, blind
    * to HOW FAR mass moved); W1 `= ∫|F_ref − F_cur| dx` is the average
    * distance mass must travel, in the VALUE's own units — "the p50
    * moved 12 ms", not "PSI 0.31". The closed 1-D form needs no
    * transport solver: both empirical CDFs evaluate at every observed
    * value and each gap is weighted by the distance to the next value.
    *
    * Shape: the [[ksTest]] machinery verbatim — one keyed agg to
    * (key, value) side counts (state O(#distinct values), raw rows
    * reduce FIRST), then cumulative + lead windows sharing ONE keyed
    * sort, and a closing agg on the same partitioning. Also emits
    * `w1_norm` (W1 / observed pooled range — scale-free, comparable
    * across keys). One-sided keys (no ref or no cur rows) emit NULL
    * distances with both counts visible; a single-valued key has zero
    * range and emits `w1` 0 with NULL `w1_norm`.
    */
  def wasserstein1(df: DataFrame, keys: Seq[String], valueCol: String,
                   isRef: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val counts = df
      .groupBy(keyCols :+ col(valueCol).as("__v"): _*)
      .agg(sum(when(isRef, 1L).otherwise(0L)).as("__rc"),
        sum(when(!isRef, 1L).otherwise(0L)).as("__cc"))
    val wVal = Window.partitionBy(keyCols: _*).orderBy(col("__v"))
    val wCum = wVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val nr = sum(col("__rc")).over(wAll)
    val nc = sum(col("__cc")).over(wAll)
    // guarded BEFORE the division: a one-sided key would otherwise put
    // IEEE Inf/NaN into the sum instead of a clean NULL
    val gap = when(nr > 0 && nc > 0, abs(
      sum(col("__rc")).over(wCum).cast("double") / nr.cast("double") -
      sum(col("__cc")).over(wCum).cast("double") / nc.cast("double")))
    val step = lead(col("__v"), 1).over(wVal) - col("__v")
    counts
      .withColumn("__t", gap * coalesce(step, lit(0.0)))
      .withColumn("__nr", nr).withColumn("__nc", nc)
      .withColumn("__range",
        max(col("__v")).over(wAll) - min(col("__v")).over(wAll))
      .groupBy(keyCols: _*)
      .agg(roundStable(sum(col("__t")), digits).as("w1"),
        roundStable(when(max(col("__range")) > 0,
          sum(col("__t")) / max(col("__range"))), digits).as("w1_norm"),
        max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cur"))
  }

  /** Quantile-shift profile (the Doksum "shift function", sampled at
    * the interior deciles): `Δ(p) = q_cur(p) − q_ref(p)` per key —
    * WHERE in the distribution the drift happened, which none of the
    * scalar monitors say: [[ksTest]] flags THAT, [[wasserstein1]] says
    * HOW MUCH on average, this says "the body is stable but p90 moved
    * +40 ms" — the readout that turns a drift alarm into a diagnosis
    * (tail regression vs location shift vs spread change read as three
    * distinct signatures across the deciles).
    *
    * Exact interpolated percentiles on BOTH sides (the same
    * `percentile` ≡ `quantile_cont` semantics as A50/A65), probe
    * points spelled as double literals (`D` suffix — the q197
    * decimal-literal trap, dodged). One conditional aggregation per
    * key (two percentile buffers over one scan), then a bounded
    * explode to (key, decile) rows. One-sided keys keep their rows
    * with the missing side NULL — visible, not dropped.
    */
  def qqShift(df: DataFrame, keys: Seq[String], valueCol: String,
              isRef: Column, parts: Int = 10, digits: Int = 6): DataFrame = {
    require(parts >= 2, s"need parts >= 2, got $parts")
    val keyCols = keys.map(col)
    val probs = (1 until parts).map(_.toDouble / parts)
    val pSql = probs.map(p => s"${p}D").mkString("array(", ",", ")")
    val nullArr = array(probs.map(_ => lit(null).cast("double")): _*)
    val staged = df.withColumn("__ref", isRef)
      .groupBy(keyCols: _*)
      .agg(
        expr(s"percentile(IF(__ref, $valueCol, NULL), $pSql)").as("__qr"),
        expr(s"percentile(IF(NOT __ref, $valueCol, NULL), $pSql)").as("__qc"))
      .withColumn("__qr", coalesce(col("__qr"), nullArr))
      .withColumn("__qc", coalesce(col("__qc"), nullArr))
    staged
      .select(keyCols :+ posexplode(arrays_zip(col("__qr"), col("__qc"))): _*)
      .select(keyCols ++ Seq(
        (col("pos") + 1).cast("long").as("decile"),
        roundStable(col("col.__qr"), digits).as("q_ref"),
        roundStable(col("col.__qc"), digits).as("q_cur"),
        roundStable(col("col.__qc") - col("col.__qr"), digits)
          .as("shift")): _*)
  }

  /** Mutual information (and normalized MI) between two categoricals
    * per key — the information-theoretic companion to
    * [[chiSquareIndep]]: chi-square answers "are they independent"
    * against a null; MI measures HOW MANY NATS one column tells you
    * about the other, and `NMI = MI / sqrt(H_a·H_b)` puts it on [0, 1]
    * for cross-cohort comparison — the feature-redundancy screen run
    * before two correlated features both enter a model.
    *
    * Single pass: one agg to observed (key, a, b) cells, then the
    * marginals come from windows partitioned by (key, a) / (key, b)
    * over those cell rows — nothing re-scans the input. The marginal
    * entropies fold over the SAME cell rows via `Σ_b n_ab = n_a`
    * (each cell contributes `(n_ab/n)·ln(n_a/n)` — summing recovers
    * `Σ_a (n_a/n)·ln(n_a/n)` exactly), so no second aggregation
    * exists. Observed cells only; every term is finite (n_ab ≥ 1).
    * A key where either column is constant has H = 0: MI is 0 by
    * construction and NMI is NULL (nothing to normalize by).
    */
  def mutualInfo(df: DataFrame, keys: Seq[String], aCol: String,
                 bCol: String, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df
      .groupBy(keyCols :+ col(aCol).as("__a") :+ col(bCol).as("__b"): _*)
      .agg(count(lit(1)).cast("double").as("__o"))
    val wAll = Window.partitionBy(keyCols: _*)
    val wA = Window.partitionBy(keyCols :+ col("__a"): _*)
    val wB = Window.partitionBy(keyCols :+ col("__b"): _*)
    val n = sum(col("__o")).over(wAll)
    val na = sum(col("__o")).over(wA)
    val nb = sum(col("__o")).over(wB)
    val p = col("__o") / col("__n")
    cells
      .withColumn("__n", n)
      .withColumn("__na", na).withColumn("__nb", nb)
      .withColumn("__mi", p * log(col("__o") * col("__n") /
        (col("__na") * col("__nb"))))
      .withColumn("__ha", -p * log(col("__na") / col("__n")))
      .withColumn("__hb", -p * log(col("__nb") / col("__n")))
      .groupBy(keyCols: _*)
      .agg(
        roundStable(sum(col("__mi")), digits).as("mi"),
        roundStable(sum(col("__ha")), digits).as("h_a"),
        roundStable(sum(col("__hb")), digits).as("h_b"),
        roundStable(when(sum(col("__ha")) > 0 && sum(col("__hb")) > 0,
          sum(col("__mi")) / sqrt(sum(col("__ha")) * sum(col("__hb")))),
          digits).as("nmi"),
        max(col("__n")).cast("long").as("n"),
        count(lit(1)).as("n_cells"))
  }

  /** Adjusted standardized residuals per contingency cell (Haberman
    * 1973) — WHICH cells drive a significant chi-square: the keyed
    * test ([[chiSquareIndep]]) says THE TABLE is off; this says
    * "errors × Sunday is 4.2σ over expectation", the actionable unit.
    * `r_adj = (O − E) / √(E·(1 − n_i/N)·(1 − n_j/N))` — the margin
    * correction matters: raw Pearson residuals over-flag fat rows.
    * One cell aggregation + margin windows over O(#cells) rows;
    * flags at |r| > 3 compare 6dp-ROUNDED values. Only OBSERVED cells
    * emit rows — a structurally-absent combination (O = 0 with large
    * E, the "surprisingly missing" case) needs the caller to pre-fill
    * the cross product if it matters for their table.
    */
  def cellResiduals(df: DataFrame, aCol: Column, bCol: Column,
                    digits: Int = 6): DataFrame = {
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("__o"))
    val wA = Window.partitionBy(col("a"))
    val wB = Window.partitionBy(col("b"))
    val wAll = Window.partitionBy(lit(1))
    val o = col("__o").cast("double")
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val n = col("__n").cast("double")
    val e = na * nb / n
    val denom = sqrt(e * (lit(1.0) - na / n) * (lit(1.0) - nb / n))
    val r = (o - e) / denom
    val staged = cells
      .withColumn("__na", sum(col("__o")).over(wA))
      .withColumn("__nb", sum(col("__o")).over(wB))
      .withColumn("__n", sum(col("__o")).over(wAll))
    staged.select(col("a"), col("b"), col("__o").as("observed"),
        roundStable(e, digits).as("expected"),
        roundStable(when(denom > 0, r), digits).as("adj_residual"))
      .withColumn("surprising",
        when(col("adj_residual").isNotNull,
          (abs(col("adj_residual")) > lit(3.0)).cast("long")))
  }

  /** Binary-segmentation changepoint detection, depth 2 (Scott &
    * Knott 1974 lineage; the mean-shift cost) — WHERE does the series
    * change, up to three changepoints: find the split minimizing
    * `SSE_left + SSE_right`, then split each half again. The
    * multi-changepoint upgrade of [[pettitt]] (one CP) — a series
    * that steps up then back down defeats any single-CP test. Each
    * level is pure windows over the ordered series: per-segment
    * ORDERED prefix sums give every candidate's two-sided SSE in
    * closed form (`SSE(l..r) = Σx² − (Σx)²/n`), the argmin ranks on
    * the 6dp-ROUNDED cost with a position tiebreak, and segment
    * totals are read from the LAST cumulative row — ordered sums are
    * bit-deterministic cross-engine where an unordered partition
    * total is not. Segments shorter than `2·minSeg` emit no split;
    * `gain` (SSE reduction, rounded) is the caller's significance
    * knob. Output: one row per accepted split with its segment label
    * (root / L / R), global split position, order value, and gain.
    */
  def binseg(df: DataFrame, keys: Seq[String], orderCol: Column,
             tieCol: Column, valueCol: String, minSeg: Int = 5,
             digits: Int = 6): DataFrame = {
    require(minSeg >= 2, s"need minSeg >= 2, got $minSeg")
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("i", row_number().over(wOrd))
      .select(keyCols :+ orderCol.as("o") :+
        col(valueCol).cast("double").as("x") :+ col("i"): _*)

    def level(seg: DataFrame, segCols: Seq[Column], label: Column) = {
      val wLoc = Window.partitionBy(segCols: _*).orderBy(col("i"))
      val wCum = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFull = wLoc.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val staged = seg
        .withColumn("__j", row_number().over(wLoc))
        .withColumn("__sx", sum(col("x")).over(wCum))
        .withColumn("__sxx", sum(col("x") * col("x")).over(wCum))
        .withColumn("__n", count(lit(1)).over(wFull))
        .withColumn("__sxN", last(col("__sx")).over(wFull))
        .withColumn("__sxxN", last(col("__sxx")).over(wFull))
      val j = col("__j").cast("double")
      val n = col("__n").cast("double")
      val sseL = col("__sxx") - col("__sx") * col("__sx") / j
      val sseR = (col("__sxxN") - col("__sxx")) -
        (col("__sxN") - col("__sx")) * (col("__sxN") - col("__sx")) /
          (n - j)
      val sseT = col("__sxxN") - col("__sxN") * col("__sxN") / n
      val cand = staged
        .filter(col("__j") >= minSeg &&
          col("__j") <= col("__n") - minSeg)
        .withColumn("__cost", roundStable(sseL + sseR, digits))
        .withColumn("__gain", roundStable(sseT, digits) - col("__cost"))
      val wPick = Window.partitionBy(segCols: _*)
        .orderBy(col("__cost").asc, col("__j").asc)
      cand.withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") === 1)
        .select(keyCols :+ label.as("segment") :+
          col("__n").as("n_seg") :+ col("i").as("split_i") :+
          col("o").as("split_at") :+
          roundStable(col("__gain"), digits).as("gain"): _*)
    }

    val s1 = level(ranked, keyCols, lit("root")).localCheckpoint()
    val sided = ranked.join(
        s1.select(keyCols :+ col("split_i").as("__sp"): _*), keys)
      .withColumn("__side", when(col("i") <= col("__sp"), "L")
        .otherwise("R"))
    val s2 = level(sided, keyCols :+ col("__side"), col("__side"))
      .select(s1.columns.map(col): _*)
    s1.union(s2)
  }

  /** Peak detection per key over an ordered series — the incident
    * finder: points that are LOCAL maxima (strictly above the
    * previous point, at least the next — a deterministic plateau
    * convention) AND robustly high (above median + k·1.4826·MAD, the
    * q136 robust scale with the constant pinned), flagged on
    * 6dp-ROUNDED comparisons. Endpoints have no two-sided
    * neighborhood and never flag. Two small percentile aggregations
    * + one keyed lag/lead window.
    */
  def peaks(df: DataFrame, keys: Seq[String], orderCol: Column,
            tieCol: Column, valueCol: String, k: Double = 3.0,
            digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val base = df.filter(col(valueCol).isNotNull)
    val med = base.groupBy(keyCols: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val withMed = base.join(med, keys)
    val mad = withMed.groupBy(keyCols: _*)
      .agg(expr(s"percentile(abs($valueCol - __med), 0.5)").as("__mad"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
    val v = col(valueCol).cast("double")
    val thr = col("__med") + lit(k) * lit(1.4826) * col("__mad")
    withMed.join(mad, keys)
      .withColumn("__prev", lag(v, 1).over(wOrd))
      .withColumn("__next", lead(v, 1).over(wOrd))
      .withColumn("__vr", roundStable(v, digits))
      .withColumn("__tr", roundStable(thr, digits))
      .filter(col("__prev").isNotNull && col("__next").isNotNull &&
        v > col("__prev") && v >= col("__next") &&
        col("__vr") > col("__tr"))
      .select(keyCols :+ orderCol.as("o") :+ col("__vr").as("value") :+
        col("__tr").as("threshold") :+
        roundStable(v - col("__med"), digits).as("above_median"): _*)
  }

  /** X̄ control chart per key over time buckets (Shewhart 1931, with
    * Western Electric rule 4) — the SPC view of a monitored metric:
    * each bucket's subgroup mean is judged against `x̄̄ ± L·σ̂/√n_d`
    * where x̄̄ is the grand (row-weighted) mean and σ̂² the POOLED
    * within-bucket variance — pooling is the point: the limits price
    * ordinary within-bucket noise, so a bucket mean outside them is a
    * between-bucket shift ([[cusum]] hears slow drifts sooner; the
    * chart localizes single-bucket excursions and needs no reference
    * window). Flags: `out_of_control` (rule 1, |x̄_d| beyond limits)
    * and `run_flag` (rule 4: 8 consecutive buckets same side of
    * center). All comparisons run on 6dp-ROUNDED values so both
    * engines flag the identical buckets (the rank-tie discipline).
    * One subgroup agg + per-key stats via windows over the O(#keys ×
    * #buckets) subgroup rows — no join, no second scan of raw rows.
    * Single-row buckets carry no variance contribution; keys with
    * zero pooled d.f. emit NULL limits.
    */
  def xbarChart(df: DataFrame, keys: Seq[String], bucketCol: Column,
                valueCol: String, l: Double = 3.0,
                digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val sub = df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols :+ bucketCol.as("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        avg(col(valueCol)).as("__xbar"),
        var_samp(col(valueCol)).as("__v"))
    val wAll = Window.partitionBy(keyCols: _*)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("bucket"))
      .rowsBetween(-7, Window.currentRow)
    val nD = col("n").cast("double")
    val grand = sum(col("__xbar") * nD).over(wAll) / sum(nD).over(wAll)
    val poolDf = sum(when(col("__v").isNotNull, nD - lit(1.0))).over(wAll)
    val pooled = sum(when(col("__v").isNotNull,
      (nD - lit(1.0)) * col("__v"))).over(wAll) / poolDf
    val se = sqrt(col("__pool") / nD)
    val staged = sub
      .withColumn("__grand", grand)
      .withColumn("__pdf", poolDf)
      .withColumn("__pool", when(col("__pdf") > 0, pooled))
      .withColumn("xbar", roundStable(col("__xbar"), digits))
      .withColumn("center", roundStable(col("__grand"), digits))
      .withColumn("ucl",
        roundStable(col("__grand") + lit(l) * se, digits))
      .withColumn("lcl",
        roundStable(col("__grand") - lit(l) * se, digits))
      .withColumn("__above", (col("xbar") > col("center")).cast("long"))
      .withColumn("__below", (col("xbar") < col("center")).cast("long"))
    staged
      .withColumn("out_of_control",
        (col("ucl").isNotNull &&
          (col("xbar") > col("ucl") || col("xbar") < col("lcl")))
          .cast("long"))
      .withColumn("run_flag",
        (count(lit(1)).over(wOrd) === 8 &&
          (sum(col("__above")).over(wOrd) === 8 ||
            sum(col("__below")).over(wOrd) === 8)).cast("long"))
      .select(keyCols ++ Seq(col("bucket"), col("n"), col("xbar"),
        col("center"), col("ucl"), col("lcl"), col("out_of_control"),
        col("run_flag")): _*)
  }

  /** Poisson overdispersion (variance-to-mean) test per key — the
    * count-side twin of the inter-arrival burstiness screen: arrival
    * counts per exposure unit (user-day, sensor-hour) should have
    * variance ≈ mean under a Poisson process; clumped traffic (bots,
    * retry storms, batched uploads) pushes the dispersion index
    * `D = s²/x̄` above 1. Emits D, the Fisher chi-square statistic
    * `(n−1)·D` (~χ²_{n−1} under H₀), and Fisher's normal approximation
    * `z = √(2χ²) − √(2(n−1)−1)` — comparable across keys with
    * different unit counts. Counts are over OCCUPIED units only (an
    * exposure grid would need a calendar join; documented — zeros
    * make D strictly larger, so this reading is conservative toward
    * flagging). Variance from raw moments `(Σc² − n·x̄²)/(n−1)` — the
    * moments discipline, identical on both engines. Keys with < 2
    * units or zero mean emit NULL statistics with counts visible.
    */
  def dispersionIndex(df: DataFrame, keys: Seq[String], unitCols: Seq[Column],
                      digits: Int = 6): DataFrame = {
    require(unitCols.nonEmpty, "need at least one unit column")
    val keyCols = keys.map(col)
    val units = df
      .groupBy(keyCols ++ unitCols.zipWithIndex.map { case (c, i) =>
        c.as(s"__u$i") }: _*)
      .agg(count(lit(1)).cast("double").as("__c"))
    val stats = units.groupBy(keyCols: _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__c")).as("__s1"),
        sum(col("__c") * col("__c")).as("__s2"))
    val n = col("__n")
    val mean = col("__s1") / n
    val variance = (col("__s2") - n * mean * mean) / (n - 1)
    val d = variance / mean
    val chi2 = (n - 1) * d
    val ok = n > 1 && mean > 0
    stats.select(keyCols ++ Seq(
      n.cast("long").as("n_units"),
      col("__s1").cast("long").as("n_events"),
      roundStable(mean, digits).as("mean_per_unit"),
      roundStable(when(ok, d), digits).as("dispersion"),
      roundStable(when(ok, chi2), digits).as("chi2"),
      roundStable(when(ok, sqrt(lit(2.0) * chi2) -
        sqrt(lit(2.0) * (n - 1) - 1)), digits).as("z")): _*)
  }

  /** Last-digit uniformity screen — the fabrication complement of
    * A36's Benford first-digit test: FIRST digits of natural
    * magnitudes follow Benford, but LAST digits of genuine
    * fine-grained measurements are near-uniform — humans inventing
    * numbers round and favor digits, so a spiked last-digit
    * distribution flags manual entry/fabrication where Benford stays
    * quiet (and vice versa). Per key: chi-square GOF of integer-part
    * last digits against uniform 1/10 (all ten digits MATERIALIZED —
    * an absent digit is (0−n/10)²/(n/10) of evidence, not a missing
    * row), plus the most-over-represented digit and its share. One
    * cell agg + a 10-literal grid; keys with n = 0 never emit.
    */
  def lastDigitUniformity(df: DataFrame, keys: Seq[String],
                          valueCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val v = valueCol.cast("double")
    val cells = df.filter(v.isNotNull)
      .groupBy(keyCols :+ (floor(abs(v)) % 10).cast("int").as("__d"): _*)
      .agg(count(lit(1)).cast("double").as("__c"))
    val grid = cells.select(keyCols: _*).distinct()
      .crossJoin(broadcast(
        df.sparkSession.range(0, 10).select(col("id").cast("int").as("__d"))))
    val wKey = Window.partitionBy(keyCols: _*)
    val full = grid.join(cells, keys :+ "__d", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0.0)))
      .withColumn("__n", sum(col("__c")).over(wKey))
      .withColumn("__e", col("__n") / 10)
    val wTop = Window.partitionBy(keyCols: _*)
      .orderBy(col("__c").desc, col("__d").asc)
    full
      .withColumn("__chi2", sum((col("__c") - col("__e")) *
        (col("__c") - col("__e")) / col("__e")).over(wKey))
      .withColumn("__rk", row_number().over(wTop))
      .filter(col("__rk") === 1)
      .select(keyCols ++ Seq(col("__n").cast("long").as("n"),
        roundStable(col("__chi2"), digits).as("chi2"),
        col("__d").as("top_digit"),
        roundStable(col("__c") / col("__n"), digits).as("top_share")): _*)
  }

  /** Friedman rank test (Friedman 1937) — the repeated-measures
    * Kruskal-Wallis: does any TREATMENT consistently rank above the
    * others ACROSS blocks (e.g. "is one event type's daily mean
    * reliably highest, day after day"), with each block ranked
    * internally so block-level shifts cancel — the nonparametric
    * answer when A98's ANOVA assumptions don't hold and the blocks
    * differ wildly in level. Cells are per-(block, treatment) means
    * of the 6dp-rounded staging; ties take MEAN ranks
    * (`rank + (ties−1)/2`); only COMPLETE blocks vote (a block
    * missing a treatment would bias every rank sum — dropped,
    * counted in `n_blocks` implicitly). Emits per treatment: rank
    * sum + mean rank, with the global `Q = 12/(nk(k+1))·ΣR² −
    * 3n(k+1)` (~χ²_{k−1}, uncorrected for ties — documented) on
    * every row. One cell agg, ranks over O(#blocks × k) rows.
    */
  def friedman(df: DataFrame, blockCol: Column, treatmentCol: Column,
               valueCol: Column, digits: Int = 6): DataFrame = {
    val cells = df
      .groupBy(blockCol.as("__b"), treatmentCol.as("__t"))
      .agg(roundStable(avg(valueCol), digits).as("__v"))
    val k = cells.agg(count_distinct(col("__t")).as("__k"))
    val complete = cells
      .withColumn("__bc", count(lit(1)).over(
        Window.partitionBy(col("__b"))))
      .crossJoin(broadcast(k))
      .filter(col("__bc") === col("__k"))
    val wRank = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val wTie = Window.partitionBy(col("__b"), col("__v"))
    val ranked = complete
      .withColumn("__r", rank().over(wRank) +
        (count(lit(1)).over(wTie) - 1) / 2.0)
    val byT = ranked.groupBy(col("__t").as("treatment"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("__r")).as("__rs"),
        first(col("__k")).as("__kk"))
    val n = col("n_blocks").cast("double")
    val kk = col("__kk").cast("double")
    val wAll = Window.partitionBy(lit(1))
    byT
      .withColumn("__q", lit(12.0) / (n * kk * (kk + 1)) *
        sum(col("__rs") * col("__rs")).over(wAll) -
        lit(3.0) * n * (kk + 1))
      .select(col("treatment"), col("n_blocks"),
        roundStable(col("__rs"), digits).as("rank_sum"),
        roundStable(col("__rs") / n, digits).as("mean_rank"),
        roundStable(col("__q"), digits).as("q_stat"))
  }

  /** Negative-binomial method-of-moments fit per key — the MODEL
    * upgrade of [[dispersionIndex]]: once D > 1 says counts are
    * clumped, NB(r, p) with `p = x̄/s²`, `r = x̄²/(s² − x̄)` (mean
    * `r(1−p)/p`, variance `r(1−p)/p²` — MoM inverts exactly) says HOW
    * clumped, and `P(X=0) = p^r` predicts the silent-unit share a
    * Poisson model would underestimate — the capacity/alerting number
    * (expected zero-traffic user-days). Same occupied-unit staging as
    * dispersionIndex; keys that are NOT overdispersed (s² ≤ x̄ — MoM
    * leaves the NB family) or degenerate (< 2 units, zero mean) emit
    * NULL parameters with moments visible, never a junk fit.
    */
  def negbinFit(df: DataFrame, keys: Seq[String], unitCols: Seq[Column],
                digits: Int = 6): DataFrame = {
    require(unitCols.nonEmpty, "need at least one unit column")
    val keyCols = keys.map(col)
    val units = df
      .groupBy(keyCols ++ unitCols.zipWithIndex.map { case (c, i) =>
        c.as(s"__u$i") }: _*)
      .agg(count(lit(1)).cast("double").as("__c"))
    val stats = units.groupBy(keyCols: _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__c")).as("__s1"),
        sum(col("__c") * col("__c")).as("__s2"))
    val n = col("__n")
    val mean = col("__s1") / n
    val variance = (col("__s2") - n * mean * mean) / (n - 1)
    val ok = n > 1 && mean > 0 && variance > mean
    val p = mean / variance
    val r = mean * mean / (variance - mean)
    stats.select(keyCols ++ Seq(
      n.cast("long").as("n_units"),
      roundStable(mean, digits).as("mean"),
      roundStable(when(n > 1, variance), digits).as("variance"),
      roundStable(when(ok, r), digits).as("r_hat"),
      roundStable(when(ok, p), digits).as("p_hat"),
      roundStable(when(ok, pow(p, r)), digits).as("p0_hat")): _*)
  }

  /** Cochran-Armitage trend test per key (Cochran 1954; Armitage
    * 1955) — is a binary RATE monotonically trending across ORDERED
    * groups: with group scores w and per-group (n_i, x_i) success
    * tallies, `T = Σw_i x_i − p̄·Σw_i n_i`, `Var = p̄(1−p̄)·(Σn_i w_i²
    * − (Σn_i w_i)²/N)`, `z = T/√Var` (~N(0,1) under no trend). The
    * dose-response complement of the drift family: A35/A38 ask "are
    * the groups different at all"; this asks "do they RISE in the
    * score order" — one degree of freedom, so it sees a monotone
    * drift long before the omnibus chi-square does. (q216's
    * Mann-Kendall trends a CONTINUOUS series; this trends a rate.)
    * One (key, score) cell agg (the 100 TB reduction), one per-key
    * fold. Degenerate keys — all-success/all-failure (p̄(1−p̄)=0) or
    * a single group (score variance 0) — emit NULL z with counts
    * visible.
    */
  def cochranArmitage(df: DataFrame, keys: Seq[String], scoreCol: Column,
                      isSuccess: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df
      .groupBy(keyCols :+ scoreCol.cast("double").as("__w"): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(when(isSuccess, 1.0).otherwise(0.0)).as("__x"))
    val st = cells.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__n")).as("__nn"), sum(col("__x")).as("__xx"),
        sum(col("__w") * col("__x")).as("__wx"),
        sum(col("__w") * col("__n")).as("__wn"),
        sum(col("__n") * col("__w") * col("__w")).as("__wwn"))
    val p = col("__xx") / col("__nn")
    val t = col("__wx") - p * col("__wn")
    val v = p * (lit(1.0) - p) *
      (col("__wwn") - col("__wn") * col("__wn") / col("__nn"))
    st.select(keyCols ++ Seq(col("n_groups"),
      col("__nn").cast("long").as("n"),
      col("__xx").cast("long").as("n_success"),
      roundStable(p, digits).as("p_bar"),
      roundStable(t, digits).as("t_stat"),
      roundStable(when(v > 0, t / sqrt(v)), digits).as("z")): _*)
  }
}
