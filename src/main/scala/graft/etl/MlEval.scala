package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Classifier-evaluation aggregates at corpus scale — the readouts a
  * quality/toxicity/language filter model is judged by before it gates
  * a 100 TB corpus: AUC (threshold-free ranking power), calibration
  * (do predicted probabilities MEAN anything), and the gains table
  * (what does acting on the top decile actually capture). All exact,
  * all keyed aggregations — no sampling, no sklearn-on-the-driver.
  */
object MlEval {

  /** ROC AUC per key via the rank (Mann-Whitney) identity
    * `AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)` — the probability a
    * random positive outranks a random negative, tie-exact through
    * midranks (the [[Aggregates.mannWhitneyU]] machinery: scores
    * reduce to per-(key, score) counts FIRST, so per-key state is
    * O(#distinct scores) and nothing corpus-scale sorts). A key
    * missing a class emits NULL (AUC undefined), with both class
    * counts visible.
    */
  def auc(df: DataFrame, keys: Seq[String], scoreCol: Column,
          isPositive: Column, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val counts = df
      .groupBy(keyCols :+ scoreCol.as("__v"): _*)
      .agg(sum(when(isPositive, 1L).otherwise(0L)).as("__ca"),
        sum(when(!isPositive, 1L).otherwise(0L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val below = sum(col("__t")).over(wOrd) - col("__t")
    val avgRank = below.cast("double") + (col("__t") + lit(1)).cast("double") / 2
    val enriched = counts
      .withColumn("__ra", avgRank * col("__ca"))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
    val na = max(col("__na")).cast("double")
    val nb = max(col("__nb")).cast("double")
    val u = sum(col("__ra")) - na * (na + 1) / 2
    enriched
      .groupBy(keyCols: _*)
      .agg(
        roundStable(when(na > 0 && nb > 0, u / (na * nb)), decimals)
          .as("auc"),
        max(col("__na")).as("n_pos"), max(col("__nb")).as("n_neg"))
  }

  /** Reliability diagram + ECE terms: scores in [0, 1] cut into `bins`
    * equal-width bins (top edge closed); per bin the mean predicted
    * score (confidence), the observed positive rate (accuracy), and
    * the bin's ECE contribution `n_b/N · |acc − conf|` — sum the
    * column for the scalar ECE. One aggregation; bin ids are exact
    * integer floors of the rounded score (cross-engine boundary
    * stability — the binId discipline).
    */
  def calibration(df: DataFrame, scoreCol: Column, isPositive: Column,
                  bins: Int = 10, decimals: Int = 6): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val s = roundStable(scoreCol, 9)
    val bin = least(floor(s * bins), lit(bins - 1)).cast("long")
    val wAll = Window.partitionBy()
    df.filter(scoreCol.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        avg(s).as("__conf"),
        avg(when(isPositive, 1.0).otherwise(0.0)).as("__acc"))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .select(col("bin"), col("n"),
        roundStable(col("__conf"), decimals).as("confidence"),
        roundStable(col("__acc"), decimals).as("accuracy"),
        roundStable(col("n").cast("double") / col("__tot") *
          abs(col("__acc") - col("__conf")), decimals).as("ece_term"))
  }

  /** Brier score with the EXACT Murphy (1973) decomposition per key —
    * the probabilistic-forecast score card one level deeper than
    * [[calibration]]'s ECE: `Brier = REL − RES + UNC`, where
    * reliability is the calibration gap (lower better), resolution is
    * how much the forecasts actually SEPARATE outcomes (higher
    * better — a perfectly calibrated forecaster that always says the
    * base rate has REL 0 and RES 0: calibrated and useless, the
    * failure mode ECE alone cannot see), and uncertainty `ȳ(1−ȳ)` is
    * the base rate's own entropy — the floor no forecaster beats
    * without information. Grouping by DISTINCT (rounded) forecast
    * value rather than bins makes the decomposition an IDENTITY, not
    * an approximation (spec'd to 1e-9): per cell
    * `Σ(s−y)² = n·s² − 2·s·pos + pos` since y² = y. Per-key state
    * O(#distinct scores) — the A61 discipline.
    */
  def brierDecomposition(df: DataFrame, keys: Seq[String],
                         scoreCol: Column, isPositive: Column,
                         decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val s = roundStable(scoreCol, 9)
    val cells = df.filter(scoreCol.isNotNull)
      .groupBy(keyCols :+ s.as("__s"): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(when(isPositive, 1.0).otherwise(0.0)).as("__pos"))
    val wAll = Window.partitionBy(keyCols: _*)
    val nTot = sum(col("__n")).over(wAll)
    val yBar = sum(col("__pos")).over(wAll) / nTot
    val yB = col("__pos") / col("__n")
    val staged = cells
      .withColumn("__tot", nTot)
      .withColumn("__ybar", yBar)
      .withColumn("__bt", col("__n") * col("__s") * col("__s") -
        lit(2.0) * col("__s") * col("__pos") + col("__pos"))
      .withColumn("__rel", col("__n") * (col("__s") - yB) * (col("__s") - yB))
      .withColumn("__res", col("__n") * (yB - col("__ybar")) *
        (yB - col("__ybar")))
    staged.groupBy(keyCols: _*)
      .agg(
        roundStable(sum(col("__bt")) / max(col("__tot")), decimals)
          .as("brier"),
        roundStable(sum(col("__rel")) / max(col("__tot")), decimals)
          .as("reliability"),
        roundStable(sum(col("__res")) / max(col("__tot")), decimals)
          .as("resolution"),
        roundStable(max(col("__ybar")) * (lit(1.0) - max(col("__ybar"))),
          decimals).as("uncertainty"),
        roundStable(max(col("__ybar")), decimals).as("base_rate"),
        max(col("__tot")).cast("long").as("n"))
  }

  /** Cohen's kappa per key between two categorical label columns —
    * chance-corrected agreement (Cohen 1960): raw accuracy flatters
    * any pair of raters that both favor the majority class; kappa
    * `(p_o − p_e)/(1 − p_e)` subtracts the agreement their marginals
    * would produce by luck. The readout for annotator pairs, model-vs-
    * model label comparisons, and metadata-vs-detector audits (a lang
    * column vs a content detector). One cell aggregation; expected
    * agreement meets on a per-key LABEL table (not a cell fold — see
    * the in-body note on the missing-diagonal case). Keys where both
    * raters are constant-and-identical have p_e = 1: kappa is NULL
    * there ("agreement is unfalsifiable"), with observed agreement
    * still emitted.
    */
  def cohenKappa(df: DataFrame, keys: Seq[String], aCol: Column,
                 bCol: Column, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df
      .groupBy(keyCols :+ aCol.as("__a") :+ bCol.as("__b"): _*)
      .agg(count(lit(1)).cast("double").as("__o"))
    // p_e = Σ_l (row_l · col_l) / N² sums over DISTINCT labels, not
    // cells: a label with both marginals nonzero but no (l, l) cell
    // would be missed by any cell-local fold — so the marginals meet
    // on a label table (both sides' labels unioned, absent marginal
    // coalesced to 0).
    val labels = cells.select(keyCols :+ col("__a").as("__l"): _*)
      .union(cells.select(keyCols :+ col("__b").as("__l"): _*))
      .distinct()
    val aMarg = cells.groupBy(keyCols :+ col("__a").as("__l"): _*)
      .agg(sum(col("__o")).as("__ma"))
    val bMarg = cells.groupBy(keyCols :+ col("__b").as("__l"): _*)
      .agg(sum(col("__o")).as("__mb"))
    val pe = labels
      .join(aMarg, keys :+ "__l", "left")
      .join(bMarg, keys :+ "__l", "left")
      .groupBy(keyCols: _*)
      .agg(sum(coalesce(col("__ma"), lit(0.0)) *
        coalesce(col("__mb"), lit(0.0))).as("__pexn"))
    val po = cells.groupBy(keyCols: _*)
      .agg(sum(when(col("__a") === col("__b"), col("__o"))
        .otherwise(lit(0.0))).as("__agree"),
        sum(col("__o")).as("__N"))
    po.join(pe, keys)
      .select(keyCols ++ {
        val pO = col("__agree") / col("__N")
        val pE = col("__pexn") / (col("__N") * col("__N"))
        Seq(
          roundStable(pO, decimals).as("observed_agreement"),
          roundStable(pE, decimals).as("expected_agreement"),
          roundStable(when(pE < 1, (pO - pE) / (lit(1.0) - pE)), decimals)
            .as("kappa"),
          col("__N").cast("long").as("n"))
      }: _*)
  }

  /** Split-conformal threshold per key (Vovk's conformal prediction,
    * the Angelopoulos & Bates '21 recipe): the `⌈(n+1)(1−α)⌉`-th
    * smallest calibration score — the cutoff that guarantees
    * `P(score_new ≤ q̂) ≥ 1−α` for exchangeable data, distribution-free.
    * The ML-pipeline use: calibrate a filter's nonconformity once,
    * then gate the corpus with a threshold that carries a COVERAGE
    * guarantee instead of a vibe. Exact order statistic via one keyed
    * rank window (deterministic (score, tie) order); keys too small
    * for the rank (`⌈(n+1)(1−α)⌉ > n`) emit NULL — "cannot guarantee
    * 1−α at this n" is a visible answer. Also emits the EXACT
    * guaranteed level `⌈(n+1)(1−α)⌉/(n+1)` (finite-sample, ≥ 1−α).
    */
  def conformalThreshold(df: DataFrame, keys: Seq[String],
                         scoreCol: Column, tieCol: Column, alpha: Double,
                         decimals: Int = 6): DataFrame = {
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(scoreCol, tieCol)
    val wAll = Window.partitionBy(keyCols: _*)
    val rank = ceil((col("__n") + 1) * (1.0 - alpha)).cast("long")
    df.filter(scoreCol.isNotNull)
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__k", rank)
      .filter(col("__rn") === least(col("__k"), col("__n")))
      .groupBy(keyCols: _*)
      .agg(
        roundStable(min(when(col("__k") <= col("__n"), scoreCol)), decimals)
          .as("qhat"),
        max(col("__n")).as("n_cal"),
        roundStable(max(col("__k").cast("double") / (col("__n") + 1)),
          decimals).as("guaranteed_cov"))
  }

  /** Gains/lift table: rank DESC by (score, tie), cut into `parts`
    * equal row-count buckets by EXPLICIT rank arithmetic
    * (`(rank−1)·parts DIV n` — never `ntile`, whose tie placement is
    * engine-specific); per bucket: positives, cumulative capture of
    * all positives, and lift vs the base rate. The "act on the top
    * decile" planning readout.
    *
    * Scale note, stated honestly: EXACT equal-count buckets need a
    * total order, so the rank window is global (one partition over N
    * rows) — the deliberate trade of this surface. At corpus scale
    * prefer [[calibration]] (map-side equal-WIDTH bins) or cut buckets
    * at score quantiles from `Aggregates.histSketch` and accept
    * approximate bucket sizes; this exact form is for the
    * post-aggregation / sampled-eval sizes a gains table is read at.
    */
  def gainsTable(df: DataFrame, scoreCol: Column, isPositive: Column,
                 tieCol: Column, parts: Int = 10,
                 decimals: Int = 6): DataFrame = {
    require(parts >= 2, s"need parts >= 2, got $parts")
    val wOrd = Window.orderBy(col("__s").desc, tieCol)
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.filter(scoreCol.isNotNull)
      .withColumn("__s", roundStable(scoreCol, 9))
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("bucket", expr(s"(__rn - 1) * $parts DIV __n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(isPositive, 1L).otherwise(0L)).as("n_pos"))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("__totPos", sum(col("n_pos")).over(wAll))
      .withColumn("__cumPos", sum(col("n_pos")).over(wCum))
    base.select(col("bucket"), col("n"), col("n_pos"),
      roundStable(when(col("__totPos") > 0,
        col("__cumPos").cast("double") / col("__totPos")), decimals)
        .as("capture_rate"),
      roundStable(when(col("__totPos") > 0,
        (col("n_pos").cast("double") / col("n")) /
          (col("__totPos").cast("double") / col("__tot"))), decimals)
        .as("lift"))
  }

  /** Isotonic (PAV) calibration curve over score bins — the monotone
    * upgrade of [[calibration]]'s raw reliability diagram: the
    * least-squares NON-DECREASING fit of observed positive rate to
    * score, i.e. what a production re-calibration layer would actually
    * apply (raw per-bin rates zig-zag with sampling noise; a
    * calibration map must be monotone or two thresholds invert). Fit
    * via the minimax identity (Robertson-Wright-Dykstra '88)
    * `ŷ_k = max_{i≤k} min_{j≥k} wavg(y, bins i..j)` rather than the
    * sequential pool-adjacent-violators scan — the identity is pure
    * relational algebra over the BINNED table: the corpus reduces
    * map-side to ≤ `bins` rows first (the [[calibration]] binning, so
    * per-bin weights ride along), then interval averages come from
    * prefix sums (O(B²) intervals) and the minimax is two small
    * grouped aggregations over the O(B³) (k, i, j) triples — at
    * B = 20 that is 8 000 in-flight rows regardless of corpus size.
    * Emits per occupied bin: n, mean score, raw rate, and the fitted
    * monotone `iso_rate`. Empty bins are absent (no data to pool);
    * min/max over identically-computed doubles are bit-deterministic
    * cross-engine.
    */
  def isotonicCalibration(df: DataFrame, scoreCol: Column,
                          isPositive: Column, bins: Int = 20,
                          decimals: Int = 6): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val s = roundStable(scoreCol, 9)
    val bin = least(floor(s * bins), lit(bins - 1)).cast("long")
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = df.filter(scoreCol.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(s).as("__conf"),
        sum(when(isPositive, 1.0).otherwise(0.0)).as("__pos"))
      .withColumn("__cn", sum(col("__n")).over(wCum))
      .withColumn("__cp", sum(col("__pos")).over(wCum))
    // interval (i..j) weighted mean from inclusive prefix sums:
    // (cp_j − cp_{i−1}) / (cn_j − cn_{i−1}), with the i−1 terms carried
    // on the i side as (cp_i − pos_i, cn_i − n_i)
    val lo = g.select(col("bin").as("__i"),
      (col("__cp") - col("__pos")).as("__cp0"),
      (col("__cn") - col("__n")).as("__cn0"))
    val hi = g.select(col("bin").as("__j"), col("__cp").as("__cpj"),
      col("__cn").as("__cnj"))
    val intervals = lo.join(hi, col("__i") <= col("__j"))
      .select(col("__i"), col("__j"),
        ((col("__cpj") - col("__cp0")) / (col("__cnj") - col("__cn0")))
          .as("__avg"))
    val fit = g.select(col("bin").as("__k"))
      .join(intervals, col("__i") <= col("__k") && col("__k") <= col("__j"))
      .groupBy(col("__k"), col("__i"))
      .agg(min(col("__avg")).as("__m"))
      .groupBy(col("__k").as("bin"))
      .agg(max(col("__m")).as("__fit"))
    g.join(fit, "bin")
      .select(col("bin"), col("__n").cast("long").as("n"),
        roundStable(col("__conf"), decimals).as("confidence"),
        roundStable(col("__pos") / col("__n"), decimals).as("accuracy"),
        roundStable(col("__fit"), decimals).as("iso_rate"))
  }

  /** Fleiss' kappa per key (Fleiss 1971, in the variable-rater-count
    * generalization): chance-corrected agreement for MANY raters where
    * [[cohenKappa]] handles exactly two — the labeled-data QA readout
    * for annotation pools and model ensembles. Per unit i with m_i ≥ 2
    * ratings and per-label counts m_ic:
    * `P_i = Σ_c m_ic(m_ic−1) / (m_i(m_i−1))`; observed agreement
    * `P̄_o = mean_i P_i`; chance `P̄_e = Σ_c p_c²` with p_c the label's
    * share of all pairable ratings; `κ = (P̄_o − P̄_e)/(1 − P̄_e)`.
    *
    * Single-rating units are EXCLUDED from both terms (one rating
    * cannot agree or disagree) but counted in `n_single` — silent
    * shrinkage of the basis is how agreement numbers lie. A key where
    * every pairable rating is one label has P̄_e = 1 → NULL kappa
    * ("agreement is unfalsifiable", the [[cohenKappa]] convention).
    * Shape: one (key, unit, label) cell agg, one unit fold, one label
    * fold — per-key state O(#units + #labels), nothing row-scale.
    */
  def fleissKappa(df: DataFrame, keys: Seq[String], unitCol: Column,
                  labelCol: Column, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df
      .groupBy(keyCols :+ unitCol.as("__u") :+ labelCol.as("__l"): _*)
      .agg(count(lit(1)).cast("double").as("__m"))
    val units = cells
      .groupBy(keyCols :+ col("__u"): _*)
      .agg(sum(col("__m")).as("__mi"),
        sum(col("__m") * (col("__m") - 1)).as("__agree"))
    val perUnit = units.filter(col("__mi") >= 2)
      .select(keyCols :+ col("__u") :+ col("__mi") :+
        (col("__agree") / (col("__mi") * (col("__mi") - 1))).as("__pi"): _*)
    val po = perUnit.groupBy(keyCols: _*)
      .agg(avg(col("__pi")).as("__po"),
        count(lit(1)).as("__nu"), sum(col("__mi")).as("__nr"))
    // label shares over PAIRABLE units only — a label seen solely on
    // single-rating units must not shift chance agreement
    val pe = cells
      .join(perUnit.select(keyCols :+ col("__u"): _*), keys :+ "__u")
      .groupBy(keyCols :+ col("__l"): _*)
      .agg(sum(col("__m")).as("__nc"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__nc") * col("__nc")).as("__sq"),
        sum(col("__nc")).as("__n"))
      .select(keyCols :+
        (col("__sq") / (col("__n") * col("__n"))).as("__pe"): _*)
    // key universe = every key with ANY unit (pairable or not): a cohort
    // of all single-rating units must surface as a NULL-kappa row with
    // its n_single count, not vanish — silent shrinkage of the basis is
    // how agreement numbers lie (the module discipline), and an inner
    // join on the pairable side was exactly that shrinkage.
    val singles = units.groupBy(keyCols: _*)
      .agg(sum(when(col("__mi") < 2, 1L).otherwise(0L)).as("n_single"))
    singles.join(po, keys, "left").join(pe, keys, "left")
      .select(keyCols ++ Seq(
        coalesce(col("__nu"), lit(0L)).as("n_units"),
        coalesce(col("__nr").cast("long"), lit(0L)).as("n_ratings"),
        col("n_single"),
        roundStable(col("__po"), decimals).as("observed_agreement"),
        roundStable(col("__pe"), decimals).as("expected_agreement"),
        roundStable(when(col("__pe") < 1,
          (col("__po") - col("__pe")) / (lit(1.0) - col("__pe"))),
          decimals).as("kappa")): _*)
  }

  /** Krippendorff's alpha per key (nominal metric; Krippendorff 2004 via
    * the coincidence-matrix identities) — the agreement coefficient that
    * handles MISSING ratings natively (any unit, any subset of raters),
    * which is the normal state of a crowd/ensemble labeling table.
    * Using per-unit label counts m_uc, unit totals m_u (pairable units
    * m_u ≥ 2 only): observed disagreement
    * `D_o = Σ_u (m_u² − Σ_c m_uc²)/(m_u − 1)`, expected
    * `D_e = (n² − Σ_c n_c²)/(n − 1)` with n_c = Σ_u m_uc and n = Σ n_c
    * — both exact cell-algebra folds, no pair enumeration (the
    * coincidence matrix never materializes; only its row sums and the
    * diagonal-complement totals do). `α = 1 − D_o/D_e`; all-one-label
    * keys have D_e = 0 → NULL (undefined, not perfect).
    */
  def krippendorffAlpha(df: DataFrame, keys: Seq[String], unitCol: Column,
                        labelCol: Column, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df
      .groupBy(keyCols :+ unitCol.as("__u") :+ labelCol.as("__l"): _*)
      .agg(count(lit(1)).cast("double").as("__m"))
    val units = cells
      .groupBy(keyCols :+ col("__u"): _*)
      .agg(sum(col("__m")).as("__mu"), sum(col("__m") * col("__m")).as("__sq"))
      .filter(col("__mu") >= 2)
    val doTerm = units.groupBy(keyCols: _*)
      .agg(sum((col("__mu") * col("__mu") - col("__sq")) /
        (col("__mu") - 1)).as("__do"),
        count(lit(1)).as("n_units"))
    val nc = cells
      .join(units.select(keyCols :+ col("__u"): _*), keys :+ "__u")
      .groupBy(keyCols :+ col("__l"): _*)
      .agg(sum(col("__m")).as("__nc"))
    val deTerm = nc.groupBy(keyCols: _*)
      .agg(sum(col("__nc")).as("__n"), sum(col("__nc") * col("__nc")).as("__nsq"))
      .select(keyCols :+ col("__n") :+
        ((col("__n") * col("__n") - col("__nsq")) / (col("__n") - 1))
          .as("__de"): _*)
    doTerm.join(deTerm, keys)
      .select(keyCols ++ Seq(
        col("n_units"), col("__n").cast("long").as("n_ratings"),
        roundStable(col("__do"), decimals).as("d_observed"),
        roundStable(col("__de"), decimals).as("d_expected"),
        roundStable(when(col("__de") > 0,
          lit(1.0) - col("__do") / col("__de")), decimals).as("alpha")): _*)
  }

  /** Logistic regression by Newton–Raphson with a FIXED, oracle-matchable
    * iteration count — the propensity/screening model (treatment
    * propensity for [[Aggregates.smdBalance]]-style adjustment, a
    * quality-filter calibrated on two features) trained IN-ENGINE the
    * way [[graft.sim.Geometry.pc1Power]] trains PC1: the corpus reduces
    * per round to NINE moment sums (the 3×3 Hessian `Σ w·xxᵀ` and
    * gradient `Σ x(y−p)` for design (1, x1, x2)), only those doubles
    * are collected (bounded model constant — the k-means/PC1 trainer
    * discipline), and the 3×3 Newton step solves by explicit Cramer
    * cofactors driver-side. Exactly two covariates by design: the
    * closed-form solve is what lets an engine replay the identical
    * arithmetic (an unrolled-CTE oracle included) — wider designs
    * belong to a training system, not a data engine.
    *
    * Covariates are standardized internally (population moments, one
    * agg) — Newton from β=0 on standardized inputs converges in 3-4
    * rounds on any non-separated data; intermediates stay UNROUNDED
    * (Newton is contractive near the root, so engine-order fp noise
    * ~1e-12 survives to the output far below the 6dp rounding), the
    * PC1 lesson. Output: one row per term (intercept, x1, x2) with the
    * final β.
    */
  def logisticNewton(df: DataFrame, yCol: Column, x1Col: Column,
                     x2Col: Column, iters: Int = 4,
                     decimals: Int = 6): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(yCol.cast("double").as("__y"),
        x1Col.cast("double").as("__x1r"), x2Col.cast("double").as("__x2r"))
      .filter(col("__y").isNotNull && col("__x1r").isNotNull &&
        col("__x2r").isNotNull)
    val mrow = base.agg(
      avg(col("__x1r")).as("m1"),
      sqrt(avg(col("__x1r") * col("__x1r")) -
        avg(col("__x1r")) * avg(col("__x1r"))).as("s1"),
      avg(col("__x2r")).as("m2"),
      sqrt(avg(col("__x2r") * col("__x2r")) -
        avg(col("__x2r")) * avg(col("__x2r"))).as("s2"),
      count(lit(1)).as("n")).collect()(0)
    val (m1, s1, m2, s2) = (mrow.getDouble(0), mrow.getDouble(1),
      mrow.getDouble(2), mrow.getDouble(3))
    val n = mrow.getLong(4)
    require(s1 > 0 && s2 > 0,
      "constant covariate — standardization (and the fit) undefined")
    val d = base.select(col("__y"),
        ((col("__x1r") - lit(m1)) / lit(s1)).as("__x1"),
        ((col("__x2r") - lit(m2)) / lit(s2)).as("__x2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var b0 = 0.0; var b1 = 0.0; var b2 = 0.0
    var it = 0
    while (it < iters) {
      val eta = lit(b0) + lit(b1) * col("__x1") + lit(b2) * col("__x2")
      val r = d
        .select(col("__y"), col("__x1"), col("__x2"),
          (lit(1.0) / (lit(1.0) + exp(-eta))).as("__p"))
        .agg(
          sum(col("__p") * (lit(1.0) - col("__p"))).as("h11"),
          sum(col("__p") * (lit(1.0) - col("__p")) * col("__x1")).as("h12"),
          sum(col("__p") * (lit(1.0) - col("__p")) * col("__x2")).as("h13"),
          sum(col("__p") * (lit(1.0) - col("__p")) * col("__x1") * col("__x1")).as("h22"),
          sum(col("__p") * (lit(1.0) - col("__p")) * col("__x1") * col("__x2")).as("h23"),
          sum(col("__p") * (lit(1.0) - col("__p")) * col("__x2") * col("__x2")).as("h33"),
          sum(col("__y") - col("__p")).as("g0"),
          sum((col("__y") - col("__p")) * col("__x1")).as("g1"),
          sum((col("__y") - col("__p")) * col("__x2")).as("g2"))
        .collect()(0)
      val (a, b, c) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val (dd, e, f) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val (g0, g1, g2) = (r.getDouble(6), r.getDouble(7), r.getDouble(8))
      // Cramer on the symmetric H = [[a,b,c],[b,dd,e],[c,e,f]] — the
      // SAME first-row cofactor expansions (and parenthesization) the
      // oracle SQL replays
      val det = a * (dd * f - e * e) - b * (b * f - e * c) +
        c * (b * e - dd * c)
      val d0 = g0 * (dd * f - e * e) - b * (g1 * f - e * g2) +
        c * (g1 * e - dd * g2)
      val d1 = a * (g1 * f - e * g2) - g0 * (b * f - e * c) +
        c * (b * g2 - g1 * c)
      val d2 = a * (dd * g2 - g1 * e) - b * (b * g2 - g1 * c) +
        g0 * (b * e - dd * c)
      b0 = b0 + d0 / det
      b1 = b1 + d1 / det
      b2 = b2 + d2 / det
      it += 1
    }
    d.unpersist(blocking = false)
    Seq(("intercept", b0), ("x1", b1), ("x2", b2)).toDF("term", "__b")
      .select(col("term"), roundStable(col("__b"), decimals).as("beta"),
        lit(n).as("n_obs"))
      .orderBy(col("term"))
  }

  /** Platt scaling (Platt 1999) — the PARAMETRIC classifier calibrator
    * beside [[isotonicCalibration]]'s monotone one: fit
    * `P(y|s) = σ(a·s + b)` by Newton–Raphson with a fixed iteration
    * count, the [[logisticNewton]] discipline shrunk to its 2×2 case
    * (five moment sums per round — Σw·s², Σw·s, Σw, Σ(y−p)s, Σ(y−p) —
    * collected as bounded constants, closed-form 2×2 solve; oracle
    * unrolls the identical recurrence). Use isotonic when the
    * calibration curve may be non-sigmoid; Platt when calibration data
    * is thin (2 parameters can't overfit 20 bins). Output: one row per
    * parameter (slope, intercept).
    */
  def plattScaling(df: DataFrame, scoreCol: Column, isPositive: Column,
                   iters: Int = 4, decimals: Int = 6): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(scoreCol.cast("double").as("__s"),
        when(isPositive, 1.0).otherwise(0.0).as("__y"))
      .filter(col("__s").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    var a = 0.0; var b = 0.0
    var it = 0
    while (it < iters) {
      val eta = lit(a) * col("__s") + lit(b)
      val r = base
        .select(col("__s"), col("__y"),
          (lit(1.0) / (lit(1.0) + exp(-eta))).as("__p"))
        .agg(
          sum(col("__p") * (lit(1.0) - col("__p")) * col("__s") * col("__s")).as("h11"),
          sum(col("__p") * (lit(1.0) - col("__p")) * col("__s")).as("h12"),
          sum(col("__p") * (lit(1.0) - col("__p"))).as("h22"),
          sum((col("__y") - col("__p")) * col("__s")).as("g0"),
          sum(col("__y") - col("__p")).as("g1"))
        .collect()(0)
      val (h11, h12, h22) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val (g0, g1) = (r.getDouble(3), r.getDouble(4))
      val det = h11 * h22 - h12 * h12
      a = a + (g0 * h22 - h12 * g1) / det
      b = b + (h11 * g1 - g0 * h12) / det
      it += 1
    }
    base.unpersist(blocking = false)
    Seq(("intercept", b), ("slope", a)).toDF("param", "__v")
      .select(col("param"), roundStable(col("__v"), decimals).as("value"),
        lit(n).as("n_obs"))
      .orderBy(col("param"))
  }

  /** Intraclass correlation ICC(1,1) per key (Shrout & Fleiss 1979,
    * one-way random effects) — agreement for CONTINUOUS ratings, where
    * [[fleissKappa]]/[[krippendorffAlpha]] handle categories: what
    * share of rating variance is the UNITS (signal) rather than the
    * raters + noise (everything else). The reward-model / quality-score
    * QA readout: ICC near 0 means the scores mostly measure who scored,
    * not what was scored. One-way ANOVA from cell moments — per unit
    * (n_i, Σx, Σx²), then `MSB = Σn_i(x̄_i−x̄)²/(n−1)`,
    * `MSW = ΣΣ(x−x̄_i)²/(N−n)`, unequal group sizes via
    * `k₀ = (N − Σn_i²/N)/(n−1)`, `ICC = (MSB−MSW)/(MSB+(k₀−1)MSW)`.
    * Single-rating units EXCLUDED from both MS terms (one rating has no
    * within-unit variance; mixing designs silently is how reliability
    * numbers lie) and COUNTED in `n_single` — the exclusion is visible,
    * and a key whose every unit is single still emits its (NULL-icc)
    * row rather than vanishing. Degenerate keys (denominator ≤ 0,
    * <2 pairable units) NULL.
    */
  def icc(df: DataFrame, keys: Seq[String], unitCol: Column,
          ratingCol: Column, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val v = ratingCol.cast("double")
    val unitsAll = df.filter(v.isNotNull)
      .groupBy(keyCols :+ unitCol.as("__u"): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(v).as("__s"), sum(v * v).as("__q"))
    val units = unitsAll.filter(col("__n") >= 2)
    val singles = unitsAll.groupBy(keyCols: _*)
      .agg(sum(when(col("__n") < 2, 1L).otherwise(0L)).as("n_single"))
    val g = units.groupBy(keyCols: _*)
      .agg(sum(col("__n")).as("__N"), count(lit(1)).as("__k"),
        sum(col("__s")).as("__S"),
        // SSW = Σ(q_i − s_i²/n_i); SSB needs Σ s_i²/n_i too
        sum(col("__q") - col("__s") * col("__s") / col("__n")).as("__ssw"),
        sum(col("__s") * col("__s") / col("__n")).as("__sb"),
        sum(col("__n") * col("__n")).as("__nsq"))
    val nU = col("__k").cast("double")
    val ssb = col("__sb") - col("__S") * col("__S") / col("__N")
    val msb = ssb / (nU - 1)
    val msw = col("__ssw") / (col("__N") - nU)
    val k0 = (col("__N") - col("__nsq") / col("__N")) / (nU - 1)
    val denom = msb + (k0 - 1) * msw
    singles.join(g, keys, "left")
      .select(keyCols ++ Seq(
        coalesce(col("__k"), lit(0L)).as("n_units"),
        coalesce(col("__N").cast("long"), lit(0L)).as("n_ratings"),
        col("n_single"),
        roundStable(msb, decimals).as("ms_between"),
        roundStable(msw, decimals).as("ms_within"),
        roundStable(when(col("__k") >= 2 && denom > 0,
          (msb - msw) / denom), decimals).as("icc")): _*)
  }

  /** Cronbach's alpha per key (1951) — internal consistency of a
    * COMPLETE rater/item panel: does the panel of k raters (or k score
    * components) measure one underlying thing,
    * `α = k/(k−1)·(1 − Σσ²_item / σ²_total)` with σ²_total the variance
    * of per-unit SUM scores. Requires the complete design BY CONTRACT:
    * units missing any rater are EXCLUDED and counted (`n_incomplete`)
    * — α over a ragged panel is not Cronbach's α, and padding with
    * imputation would manufacture consistency. Population variances
    * (÷N, both engines identical); k from the key's own distinct
    * raters. Degenerate keys (k < 2, zero total variance, < 2 complete
    * units) NULL.
    */
  def cronbachAlpha(df: DataFrame, keys: Seq[String], unitCol: Column,
                    raterCol: Column, ratingCol: Column,
                    decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val v = ratingCol.cast("double")
    val cells = df.filter(v.isNotNull)
      .groupBy(keyCols :+ unitCol.as("__u") :+ raterCol.as("__r"): _*)
      .agg(first(v).as("__x")) // caller supplies one rating per cell;
        // first() over a 1-row group is deterministic
    val kPerKey = cells.groupBy(keyCols: _*)
      .agg(countDistinct(col("__r")).cast("double").as("__kk"))
    val unitRows = cells.groupBy(keyCols :+ col("__u"): _*)
      .agg(count(lit(1)).cast("double").as("__nr"), sum(col("__x")).as("__tot"))
    val complete = unitRows.join(kPerKey, keys)
      .withColumn("__full", col("__nr") === col("__kk"))
    val totVar = complete.filter(col("__full"))
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).cast("double").as("__m"),
        avg(col("__tot")).as("__mt"),
        avg(col("__tot") * col("__tot")).as("__qt"))
      .select(keyCols :+ col("__m") :+
        (col("__qt") - col("__mt") * col("__mt")).as("__vtot"): _*)
    val fullUnits = complete.filter(col("__full"))
      .select(keyCols :+ col("__u"): _*)
    val itemVar = cells.join(fullUnits, keys :+ "__u")
      .groupBy(keyCols :+ col("__r"): _*)
      .agg(avg(col("__x")).as("__mi"), avg(col("__x") * col("__x")).as("__qi"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__qi") - col("__mi") * col("__mi")).as("__vsum"))
    val incomplete = complete.groupBy(keyCols: _*)
      .agg(sum(when(col("__full"), 0L).otherwise(1L)).as("n_incomplete"))
    // key universe = every key with ANY rating cell: a key where NO unit
    // is complete must emit its NULL-alpha row with n_incomplete intact,
    // not vanish through the inner joins (the fleissKappa discipline —
    // silent basis shrinkage is how agreement numbers lie).
    kPerKey.join(incomplete, keys)
      .join(totVar, keys, "left").join(itemVar, keys, "left")
      .select(keyCols ++ Seq(
        coalesce(col("__m").cast("long"), lit(0L)).as("n_complete_units"),
        col("__kk").cast("long").as("k_raters"),
        col("n_incomplete"),
        roundStable(when(col("__kk") >= 2 && col("__m") >= 2 &&
          col("__vtot") > 0,
          col("__kk") / (col("__kk") - 1) *
            (lit(1.0) - col("__vsum") / col("__vtot"))), decimals)
          .as("alpha")): _*)
  }

  /** Labeling-function diagnostics (the Snorkel-style panel, Ratner et
    * al. VLDB'18's analysis table computed exactly at corpus scale):
    * per LF over a long-form (unit, lf, label) vote table —
    * `coverage` (share of ALL units it labels), `overlap` (share of
    * units where it votes and at least one OTHER LF votes), `conflict`
    * (… and at least one other voting LF DISAGREES), and
    * `majority_agreement` (share of its votes matching the per-unit
    * majority label, min-label tie-break — deterministic, the LPA
    * convention). The weak-supervision pre-flight: an LF with high
    * coverage + high conflict is the one poisoning the label model.
    * Totals ride a 1-row broadcast agg; everything else is two keyed
    * aggs + one keyed window over O(#units × #LFs) vote rows.
    */
  def lfDiagnostics(df: DataFrame, unitCol: Column, lfCol: Column,
                    labelCol: Column, decimals: Int = 6): DataFrame = {
    val votes = df.select(unitCol.as("__u"), lfCol.as("__lf"),
        labelCol.as("__l"))
      .filter(col("__l").isNotNull)
      // one vote per (unit, LF), DETERMINISTIC under duplicates: min
      // label (dropDuplicates keeps an arbitrary row — replay-unstable)
      .groupBy(col("__u"), col("__lf")).agg(min(col("__l")).as("__l"))
    val nUnits = df.select(unitCol.as("__u")).distinct()
      .agg(count(lit(1)).cast("double").as("__nu"))
    // per-unit majority label, min-label tie-break
    val maj = votes.groupBy(col("__u"), col("__l"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("__u"))
        .orderBy(col("__c").desc, col("__l").asc)))
      .filter(col("__rk") === 1)
      .select(col("__u"), col("__l").as("__maj"))
    val wUnit = Window.partitionBy(col("__u"))
    val scored = votes
      .withColumn("__nvoters", count(lit(1)).over(wUnit))
      .withColumn("__nlabels", size(collect_set(col("__l")).over(wUnit)))
      .join(maj, "__u")
    scored.groupBy(col("__lf").as("lf"))
      .agg(count(lit(1)).cast("double").as("__nv"),
        sum(when(col("__nvoters") > 1, 1.0).otherwise(0.0)).as("__ov"),
        // conflict: someone else voted AND the unit is not unanimous —
        // with >1 labels present, every voter is in conflict with someone
        sum(when(col("__nvoters") > 1 && col("__nlabels") > 1, 1.0)
          .otherwise(0.0)).as("__cf"),
        sum(when(col("__l") === col("__maj"), 1.0).otherwise(0.0)).as("__mj"))
      .crossJoin(broadcast(nUnits))
      .select(col("lf"), col("__nv").cast("long").as("n_votes"),
        roundStable(col("__nv") / col("__nu"), decimals).as("coverage"),
        roundStable(col("__ov") / col("__nu"), decimals).as("overlap"),
        roundStable(col("__cf") / col("__nu"), decimals).as("conflict"),
        roundStable(col("__mj") / col("__nv"), decimals)
          .as("majority_agreement"))
  }
}
