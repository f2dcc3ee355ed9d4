package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.roundStable

/** Aggregation / analytics operators: daily summaries, rolling means,
  * correlation matrices, KPIs, data-quality validation.
  *
  * Reference: dags/airflow_dag_calidad_aire.py:244-253 (daily summary),
  * 365-407 (validation); dashboard_calidad_aire.py:82-93 (KPIs), 126
  * (rolling mean), 225-228 (correlation matrix).
  */
object Aggregates {

  /** Daily summary per (date, key): the reference's groupby-agg block
    * (dag:244-253). Partial (map-side) aggregation comes free from
    * Catalyst's HashAggregate split — one shuffle on (date, key).
    */
  def dailySummary(df: DataFrame, tsCol: String, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("d"), col(keyCol))
      .agg(
        roundStable(avg(valueCol), 4).as("avg_value"),
        roundStable(max(valueCol), 6).as("max_value"),
        roundStable(min(valueCol), 6).as("min_value"),
        roundStable(sum(valueCol), 4).as("sum_value"),
        count(lit(1)).as("n"))

  /** Centered rolling mean over an ordered per-key series
    * (dashboard:126, pandas `rolling(window=6, center=True)` ⇒ the 6-row
    * frame [-3, +2] around each row; pandas puts the extra row on the
    * *preceding* side for even windows).
    */
  def rollingMeanCentered6(df: DataFrame, keyCol: String, orderCols: Seq[String], valueCol: String,
      outCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*).rowsBetween(-3, 2)
    df.withColumn(outCol, avg(col(valueCol)).over(w))
  }

  /** Classic additive seasonal decomposition per key series — the
    * dashboard-analytics upgrade of the rolling mean (dash:126): trend
    * (centered ±`halfWindow` rolling mean), seasonal (mean detrended
    * value per hour-of-day), residual. One keyed shuffle serves both
    * windows (same partitioning, same sort order); the seasonal table is
    * #keys × 24 rows — broadcast back onto the series.
    *
    * The residual subtracts the ROUNDED seasonal: group means fold
    * partial sums in nondeterministic order, so the raw double differs
    * in the last ulp across engines/runs and presentation rounding could
    * flip at a tie — deriving from the rounded value keeps the residual
    * bit-identical everywhere (same discipline as q79/q85).
    */
  def seasonalDecompose(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, halfWindow: Int = 12): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val wTrend = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-halfWindow, halfWindow)
    val series = df
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("trend", avg(col(valueCol)).over(wTrend))
      .withColumn("detr", col(valueCol) - col("trend"))
      .withColumn("hh", hour(col(tsCol)))
    val seasonal = series.groupBy(col(keyCol), col("hh"))
      .agg(roundStable(avg(col("detr")), 6).as("seasonal"))
    series.join(broadcast(seasonal), Seq(keyCol, "hh"))
      .select(col(keyCol), col("rn"),
        roundStable(col("trend"), 6).as("trend"),
        col("seasonal"),
        roundStable(col("detr") - col("seasonal"), 6).as("residual"))
  }

  /** Exponentially weighted moving average per key series (pandas
    * `ewm(alpha=…).mean()` adjust=true semantics, truncated at `span`
    * lags): yₜ = Σⱼ wʲ·xₜ₋ⱼ / Σⱼ wʲ with w = 1−alpha, j = 0..span. The
    * denominator is the closed-form geometric sum (1−wᵐ)/(1−w) for the
    * m ≤ span+1 rows actually in frame, so early-series rows normalize
    * exactly like pandas' adjusted EWM. Truncation makes the operator a
    * bounded window (the untruncated recurrence needs wʲ over unbounded
    * j — overflow — or an order-dependent fold — no parallelism); at
    * w ≤ 0.9, span 24 the dropped tail weighs < 8·10⁻² of a ulp‰.
    *
    * Distributed shape: ONE keyed shuffle for the window; the weighted
    * fold is a higher-order `aggregate` over the frame's collect_list —
    * pure codegen'd expressions, per-row cost O(span), no UDF.
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, alpha: Double = 0.3, span: Int = 24): DataFrame = {
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    require(span >= 1, s"need span >= 1, got $span")
    val w = 1.0 - alpha
    val wFrame = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-span, 0)
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val ll = col("__ll")
    val m = size(ll)
    // collect_list over a bare value SILENTLY DROPS nulls, which would
    // shift every older value's weight exponent — so the frame collects
    // (value, present) structs (structs are never dropped). A null keeps
    // its row slot but contributes to neither sum: pandas
    // adjust=true, ignore_na=false semantics. All-null frame → null.
    // frame order == window order, so ll(m-1) is the current row and
    // ll(i) lags by m-1-i; fold oldest→newest for a deterministic sum
    def at(i: Column) = element_at(ll, i + 1)
    val num = aggregate(sequence(lit(0), m - 1), lit(0.0),
      (acc, i) => acc + when(at(i).getField("ok"),
        at(i).getField("v") * pow(lit(w), (m - 1 - i).cast("double")))
        .otherwise(lit(0.0)))
    val den = aggregate(sequence(lit(0), m - 1), lit(0.0),
      (acc, i) => acc + when(at(i).getField("ok"),
        pow(lit(w), (m - 1 - i).cast("double"))).otherwise(lit(0.0)))
    df.withColumn("__ll", collect_list(struct(
        col(valueCol).cast("double").as("v"),
        col(valueCol).isNotNull.as("ok"))).over(wFrame))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .select(col(keyCol), col("rn"), col(valueCol),
        when(den > 0, roundStable(num / den, 6)).as("ewma"))
  }

  /** Brown's double exponential smoothing (Brown 1959 — linear
    * exponential smoothing): the trend-aware upgrade of [[ewma]] in
    * closed form over TWO chained smoothing passes — `S¹` smooths the
    * series, `S²` smooths `S¹`, then level `a = 2S¹ − S²`, trend
    * `b = α/(1−α)·(S¹ − S²)`, and the h-step forecast `a + h·b`. A
    * plain EWMA lags a trending series by design; Brown's correction
    * cancels exactly that lag — the smallest model that can forecast
    * "up and to the right". Emits each key's LATEST state (the
    * forecast you'd act on now) with 1-step and `horizon`-step
    * forecasts. Both passes ride [[ewma]]'s span-truncated frame
    * machinery verbatim (same adjust=true weights, same 6dp rounding
    * between passes — mirrored in the oracle), so the second pass
    * consumes exactly what the first emitted. Keys with a single row
    * have S¹ = S² = x → trend 0, forecast flat — the honest cold
    * start.
    */
  def brownForecast(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valueCol: String, alpha: Double = 0.3,
                    span: Int = 24, horizon: Int = 6,
                    digits: Int = 6): DataFrame = {
    require(horizon >= 1, s"need horizon >= 1, got $horizon")
    val s1 = ewma(df, keyCol, tsCol, tieCol, valueCol, alpha, span)
      .withColumnRenamed("ewma", "__s1")
    val s2 = ewma(s1, keyCol, "rn", "rn", "__s1", alpha, span)
      .withColumnRenamed("ewma", "__s2")
    val wLast = Window.partitionBy(col(keyCol)).orderBy(col("rn").desc)
    val level = lit(2.0) * col("__s1") - col("__s2")
    val trend = lit(alpha / (1 - alpha)) * (col("__s1") - col("__s2"))
    s2.withColumn("__rk", row_number().over(wLast))
      .filter(col("__rk") === 1)
      .select(col(keyCol), col("rn").as("n"),
        col("__s1").as("s1"), col("__s2").as("s2"),
        roundStable(level, digits).as("level"),
        roundStable(trend, digits).as("trend"),
        roundStable(level + trend, digits).as("forecast_1"),
        roundStable(level + lit(horizon.toDouble) * trend, digits)
          .as(s"forecast_$horizon"))
  }

  /** Rolling median over a trailing `window`-row frame per key — the
    * robust twin of [[rollingMeanCentered6]]: one spiked reading barely
    * moves it, where the mean chases every outlier. Early rows take the
    * median of the rows present (pandas `min_periods=1` semantics).
    *
    * ONE keyed shuffle; the median is sort_array over the frame's
    * collect_list + branch on parity — codegen'd expressions, O(w log w)
    * per row, no UDF. Exact-input or two-value midpoint, so engines
    * agree to the double.
    */
  def rollingMedian(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, window: Int = 6): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val wF = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(window - 1), 0)
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val ll = sort_array(collect_list(col(valueCol)).over(wF))
    val m = size(ll)
    val med = when(m % 2 === 1, element_at(ll, ((m + 1) / 2).cast("int")))
      .otherwise((element_at(ll, (m / 2).cast("int"))
        + element_at(ll, (m / 2).cast("int") + 1)) / 2.0)
    df.withColumn("rn", row_number().over(wOrd).cast("long"))
      .select(col(keyCol), col("rn"), col(valueCol),
        roundStable(med, 6).as("rolling_median"))
  }

  /** Pairwise Pearson correlation of numeric columns in long form
    * (col_a, col_b, corr) — the dashboard's `df[cols].corr()`
    * (dashboard:225-228). One aggregation computes the whole matrix;
    * `corr` is a DeclarativeAggregate, so this is a single pass with
    * map-side partials.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for { a <- cols; b <- cols if a < b } yield (a, b)
    val aggCols = pairs.map { case (a, b) => roundStable(corr(col(a), col(b)), 6).as(s"${a}__$b") }
    val wide = df.agg(aggCols.head, aggCols.tail: _*)
    // Unpivot via stack(): one row per pair, no extra scan of the input.
    val stackArgs = pairs
      .map { case (a, b) => s"'$a', '$b', `${a}__$b`" }
      .mkString(", ")
    wide.selectExpr(s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, r)")
  }

  /** The 100 TB twin of [[validate]]: sketch-based cardinality
    * (HyperLogLog++ via `approx_count_distinct`) and single-pass
    * approximate percentiles instead of exact ones. Same call shape —
    * swap in when the exact versions' sort/dedup cost bites.
    */
  def validateApprox(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      rsd: Double = 0.01): DataFrame =
    df.agg(
      count(lit(1)).as("total_records"),
      approx_count_distinct(col(keyCol), rsd).as("distinct_keys_approx"),
      min(col(tsCol)).as("min_ts"),
      max(col(tsCol)).as("max_ts"),
      roundStable(avg(col(valueCol)), 4).as("avg_value"),
      expr(s"approx_percentile($valueCol, array(0.25, 0.5, 0.75), 10000)").as("quartiles_approx"))

  /** [[validateApprox]] with every sketch cross-checked against its exact
    * twin in the same single-row aggregate: exact columns (count / time
    * range / mean) pass through for value comparison, sketch columns are
    * flattened to scalar accuracy verdicts (1/0 BIGINTs) — the HLL++
    * estimate within `distinctTol` of the exact cardinality, each
    * approx quartile inside a ±0.1-rank band around its exact rank. The
    * verdicts are engine-portable (an oracle asserts literal 1s), while
    * raw sketch values are engine-specific and never reach the output.
    * In production only the sketch half runs; this shape exists to GATE
    * the sketch config (rsd / accuracy) against exact ground truth on a
    * sample before trusting it over the full 100 TB.
    */
  def validateSketchChecked(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      rsd: Double = 0.01, distinctTol: Double = 0.05): DataFrame = {
    val agg = df.agg(
      count(lit(1)).as("total_records"),
      min(col(tsCol)).as("min_ts"),
      max(col(tsCol)).as("max_ts"),
      roundStable(avg(col(valueCol)), 4).as("avg_value"),
      approx_count_distinct(col(keyCol), rsd).as("__acd"),
      countDistinct(col(keyCol)).as("__cd"),
      expr(s"approx_percentile($valueCol, array(0.25, 0.5, 0.75), 10000)").as("__aq"),
      expr(s"percentile($valueCol, array(0.15, 0.35, 0.4, 0.6, 0.65, 0.85))").as("__eq"))
    def inBand(qIdx: Int, loIdx: Int, hiIdx: Int) =
      (element_at(col("__aq"), qIdx) >= element_at(col("__eq"), loIdx) &&
        element_at(col("__aq"), qIdx) <= element_at(col("__eq"), hiIdx)).cast("long")
    agg.select(
      col("total_records"), col("min_ts"), col("max_ts"), col("avg_value"),
      (abs(col("__acd") - col("__cd")).cast("double") / col("__cd") <= distinctTol)
        .cast("long").as("distinct_ok"),
      inBand(1, 1, 2).as("q1_ok"),
      inBand(2, 3, 4).as("median_ok"),
      inBand(3, 5, 6).as("q3_ok"))
  }

  /** Mergeable distinct-count sketches (Apache DataSketches HLL via
    * Spark's `hll_sketch_agg`): per-group binary sketches that union
    * across partitions/days without rescanning — the incremental
    * cardinality pattern for rolling 100 TB pipelines. Returns
    * (group, sketch) rows; estimate or union downstream with
    * `hll_sketch_estimate` / `hll_union_agg`.
    */
  def distinctSketch(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(expr(s"hll_sketch_agg($keyCol)").as("sketch"))

  /** [[distinctSketch]] over a composite grouping — the stored artifact
    * of the incremental-cardinality pattern is usually (entity, DAY)
    * sketches: a day's partition aggregates once, forever; any date
    * range answers by unioning its days' sketch rows (O(#days·#keys)),
    * never rescanning the raw 100 TB.
    */
  def distinctSketchKeyed(df: DataFrame, keys: Seq[String], keyCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($keyCol)").as("sketch"))

  def sketchEstimateTotal(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("distinct_estimate"))

  /** Audience overlap via THETA sketches (Datasketches; Spark 4's
    * `theta_*` surface) — the MERGEABLE-STATE path for what
    * [[audienceOverlap]] computes exactly by self-join: HLL
    * ([[distinctSketchKeyed]]) merges by union only, so "how many ids
    * did BOTH segments touch" is unanswerable from stored HLL state;
    * theta sketches intersect and difference. One sketch per segment is
    * the stored artifact (a day's partition aggregates once, forever);
    * every pair's |A∩B| / |A∪B| / |A∖B| then comes from sketch algebra
    * without rescanning raw data — where the exact self-join twin must
    * re-touch every (entity, segment) cell per query.
    *
    * Gated by the B33 (q138) discipline: sketch estimates are
    * engine-specific, so the OUTPUT carries the exact pair counts
    * (audit-scale truth from a distinct-cell self-join) plus 1/0
    * VERDICTS that each theta estimate lands within `tolerance` of
    * exact — raw estimates never reach the hash-compare. Segment pairs
    * with no shared ids still emit (inter = 0 is an answer).
    */
  def thetaOverlap(df: DataFrame, segmentCol: Column, idCol: Column,
                   tolerance: Double = 0.05,
                   digits: Int = 6): DataFrame = {
    val base = df.select(segmentCol.as("__seg"),
        idCol.cast("string").as("__aid"))
      .filter(col("__seg").isNotNull && col("__aid").isNotNull)
    val cells = base.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = cells.groupBy(col("__seg")).agg(count(lit(1)).as("__n"))
    val sk = base.groupBy(col("__seg"))
      .agg(expr("theta_sketch_agg(__aid)").as("__sk"))
    val inter = cells.as("a").join(cells.as("b"),
        col("a.__aid") === col("b.__aid") && col("a.__seg") < col("b.__seg"))
      .groupBy(col("a.__seg").as("__sa"), col("b.__seg").as("__sb"))
      .agg(count(lit(1)).as("__ni"))
    val grid = sizes.as("sa").join(sizes.as("sb"),
        col("sa.__seg") < col("sb.__seg"))
      .select(col("sa.__seg").as("__sa"), col("sb.__seg").as("__sb"),
        col("sa.__n").as("__na"), col("sb.__n").as("__nb"))
      .join(inter, Seq("__sa", "__sb"), "left")
      .withColumn("__ni", coalesce(col("__ni"), lit(0L)))
    val est = sk.as("ka").join(sk.as("kb"),
        col("ka.__seg") < col("kb.__seg"))
      .select(col("ka.__seg").as("__sa"), col("kb.__seg").as("__sb"),
        expr("theta_sketch_estimate(theta_intersection(ka.__sk, kb.__sk))")
          .as("__ei"),
        expr("theta_sketch_estimate(theta_union(ka.__sk, kb.__sk))")
          .as("__eu"),
        expr("theta_sketch_estimate(theta_difference(ka.__sk, kb.__sk))")
          .as("__ed"))
    def ok(estC: Column, exactC: Column): Column =
      (abs(estC.cast("double") - exactC.cast("double")) <=
        lit(tolerance) * greatest(exactC.cast("double"), lit(1.0)))
        .cast("long")
    val out = grid.join(est, Seq("__sa", "__sb"))
      .withColumn("__nu", col("__na") + col("__nb") - col("__ni"))
      .select(col("__sa").as("seg_a"), col("__sb").as("seg_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        col("__ni").as("n_inter"), col("__nu").as("n_union"),
        roundStable(col("__ni").cast("double") / col("__nu"), digits)
          .as("jaccard"),
        ok(col("__ei"), col("__ni")).as("inter_ok"),
        ok(col("__eu"), col("__nu")).as("union_ok"),
        ok(col("__ed"), col("__na") - col("__ni")).as("diff_ok"))
      .localCheckpoint()
    cells.unpersist(blocking = false)
    out
  }

  /** Mergeable quantile sketches — [[distinctSketchKeyed]]'s twin for
    * percentiles: per (key, slice) equal-width HISTOGRAM rows over
    * key-frozen [lo, hi] ranges (the artifact — O(keys·slices·bins)
    * rows; a day's partition aggregates once, forever). Merging is
    * plain vector addition of bin counts — any slice subset answers a
    * quantile query without rescanning raw data, with error bounded by
    * one bin width `(hi−lo)/bins` by construction. No opaque binary
    * state: the sketch is a TABLE, so it also diffs/joins/prunes like
    * one ([[graft.etl.Drift.psi]] consumes the same shape).
    *
    * Bin GEOMETRY contract: sketches only merge when they share a key's
    * [lo, hi] range. A single call freezes one geometry per key, so its
    * slices always merge; sketches built in SEPARATE calls each freeze
    * their own input's range — pass `ranges` (a (keys, __lo, __hi) table,
    * e.g. the first day's `histSketch(...).select(keys, "__lo", "__hi")
    * .distinct()`) so every call bins against the SAME frozen geometry
    * (the [[graft.streaming.DriftStream]] convention; values outside a
    * frozen range clamp into the edge bins). [[histQuantiles]] rejects
    * mixed geometries loudly rather than mixing incompatible ranges.
    */
  def histSketch(df: DataFrame, keys: Seq[String], sliceCol: String,
                 valueCol: String, bins: Int = 100,
                 ranges: Option[DataFrame] = None): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val keyCols = keys.map(col)
    val rng = ranges.getOrElse(
      df.groupBy(keyCols: _*)
        .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi")))
    df.join(broadcast(rng), keys)
      .withColumn("__bin",
        Drift.binId(col(valueCol), col("__lo"), col("__hi"), bins))
      .groupBy(keyCols ++ Seq(col(sliceCol), col("__bin"),
        col("__lo"), col("__hi")): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__bins", lit(bins))
  }

  /** Quantile estimates from merged sketch rows: per key, fold all
    * slices' bins together (vector add), then each requested p maps to
    * the UPPER EDGE of the first bin whose cumulative count reaches
    * `p·n` — within one bin width of the rank-⌈p·n⌉ order statistic
    * (which lies in that bin), and within two of the INTERPOLATED
    * percentile (whose bracketing ranks can straddle the bin edge).
    * One keyed agg + one window over O(bins) rows per key.
    *
    * Fails loudly (an eager O(keys·slices·bins) probe over the tiny
    * sketch table) when a key carries more than one [lo, hi]/bins
    * geometry — sketches from separate [[histSketch]] calls without a
    * shared `ranges` table would otherwise merge silently into wrong
    * quantiles (the cum/total windows order by __bin alone).
    */
  def histQuantiles(sketch: DataFrame, keys: Seq[String],
                    ps: Seq[Double], digits: Int = 6): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"bad ps: $ps")
    val names = ps.map(pName)
    require(names.distinct.size == names.size,
      s"percentile labels collide: $ps -> $names — request distinct ps")
    val keyCols = keys.map(col)
    val mixed = sketch.groupBy(keyCols: _*)
      .agg(countDistinct(col("__lo"), col("__hi"), col("__bins")).as("__g"))
      .filter(col("__g") > 1).limit(1).count()
    require(mixed == 0,
      "histQuantiles: a key carries sketch rows with different [lo, hi]/bins " +
        "geometries — build all slices in ONE histSketch call or pass the " +
        "same frozen `ranges` table to every call")
    // ONE shuffle of the (tiny) sketch table, by key alone: a
    // HashPartitioning(key) satisfies the (key, bin) merge grouping
    // (subset rule), the per-key cum window, AND the closing agg — a
    // plain groupBy(key, bin) would partition on the superset, split
    // keys across partitions, and force the window to re-Exchange
    // (plan-spec'd at 3 total including histSketch's two aggs)
    val merged = sketch.repartition(keyCols: _*)
      .groupBy(keyCols ++
        Seq(col("__bin"), col("__lo"), col("__hi"), col("__bins")): _*)
      .agg(sum(col("__n")).as("__n"))
    val w = Window.partitionBy(keyCols: _*)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val width = (col("__hi") - col("__lo")) / col("__bins")
    val upperEdge = col("__lo") + (col("__bin") + 1) * width
    val withCum = merged
      .withColumn("__cum", sum(col("__n")).over(wOrd))
      .withColumn("__tot", sum(col("__n")).over(w))
    val aggs = ps.map { p =>
      roundStable(min(when(col("__cum") >= col("__tot") * p, upperEdge)),
        digits).as(pName(p))
    }
    withCum.groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail :+ max(col("__tot")).as("n"): _*)
  }

  /** Collision-free percentile column label: p50, p90, p99_5 (0.995) —
    * rounding to the nearest integer percent would alias 0.995 and 1.0
    * both onto "p100" and emit a duplicate-column DataFrame.
    */
  private def pName(p: Double): String = {
    val scaled = math.rint(p * 1e6) / 1e4 // exact to 4dp of percent
    if (scaled == math.floor(scaled)) s"p${scaled.toLong}"
    else "p" + scaled.toString.replace('.', '_')
  }

  /** Roll stored per-slice sketches up to `keys` and estimate — the
    * range-query half of [[distinctSketchKeyed]].
    */
  def sketchRollup(sketches: DataFrame, keys: Seq[String]): DataFrame =
    sketches.groupBy(keys.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("distinct_estimate"))

  /** Data-quality validation block (dag:380-387): volume, null fraction,
    * key cardinality, time range, mean — one single-row aggregate.
    */
  def validate(df: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("total_records"),
      countDistinct(col(keyCol)).as("distinct_keys"),
      min(col(tsCol)).as("min_ts"),
      max(col(tsCol)).as("max_ts"),
      roundStable(avg(col(valueCol)), 4).as("avg_value"),
      roundStable(lit(100.0) * (count(lit(1)) - count(col(valueCol))) / count(lit(1)), 6)
        .as("null_pct"))

  /** KPI block (dashboard:82-93): mean, max, days whose daily mean exceeds
    * a threshold, and the percentage of such days.
    */
  def kpis(df: DataFrame, tsCol: String, valueCol: String, dayThreshold: Double): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("d"))
      .agg(avg(col(valueCol)).as("day_avg"))
    val dayStats = daily.agg(
      sum(when(col("day_avg") > dayThreshold, 1L).otherwise(0L)).as("days_over"),
      count(lit(1)).as("total_days"))
    val overall = df.agg(
      roundStable(avg(col(valueCol)), 4).as("avg_value"),
      roundStable(max(col(valueCol)), 6).as("max_value"))
    // Both sides are single-row aggregates — the cross join is trivial.
    overall.crossJoin(dayStats)
      .withColumn("pct_days_over",
        roundStable(lit(100.0) * col("days_over") / col("total_days"), 6))
  }

  /** Group with the highest average value — the dashboard's "worst
    * station" argmax (dashboard:87). Deterministic: ordered by the
    * rounded average then the key.
    */
  def worstKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(roundStable(avg(col(valueCol)), 4).as("avg_value"))
      .orderBy(col("avg_value").desc, col(keyCol))
      .limit(1)

  /** Hour-of-day profile (dashboard:198). */
  def hourlyPattern(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(hour(col(tsCol)).cast("long").as("hour"))
      .agg(roundStable(avg(col(valueCol)), 4).as("avg_value"), count(lit(1)).as("n"))

  /** Batch gap-based sessionization — the deterministic, oracle-checkable
    * twin of `streaming.EventStream.sessionize`: a new session starts when
    * the gap to the previous event (per key, ordered) exceeds `gapMicros`;
    * the running count of session-starts numbers the sessions.
    * Two window passes over one keyed sort, then a groupBy.
    */
  def sessionizeBatch(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val t = unix_micros(col(tsCol))
    val prev = lag(t, 1).over(w)
    val newSession = when(prev.isNull || t - prev > gapMicros, 1L).otherwise(0L)
    df.withColumn("__sess",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__sess").as("session_n"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        roundStable(sum(col(valueCol)), 4).as("sum_value"))
  }

  /** Z-score anomaly flags per group: rows where |value − μ| > k·σ.
    * The group stats are one aggregation joined back onto the fact side.
    * No static broadcast hint: the stats side is one row per group, but
    * the operator is generic over the group key — a caller grouping by a
    * high-cardinality key must not inherit a forced driver-side collect.
    * AQE broadcasts at runtime whenever the stats side actually fits.
    */
  def zscoreAnomalies(df: DataFrame, keyCol: String, valueCol: String, k: Double): DataFrame = {
    val stats = df.groupBy(col(keyCol)).agg(
      avg(col(valueCol)).as("__mu"), stddev_samp(col(valueCol)).as("__sd"))
    df.join(stats, keyCol)
      .withColumn("z", (col(valueCol) - col("__mu")) / col("__sd"))
      .filter(abs(col("z")) > k)
      .drop("__mu", "__sd")
  }

  /** Top-N rows per group by an explicit deterministic ordering (window
    * rank). One shuffle on the group key; with AQE a skewed group splits.
    */
  def topNPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** Day-of-week quartile distribution (dashboard:149-163, the violin
    * plot's quartiles): exact interpolated percentiles per weekday.
    */
  def dowQuartiles(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(Features.weekdayMon0(col(tsCol)).as("weekday"))
      .agg(
        roundStable(expr(s"percentile($valueCol, 0.25)"), 6).as("q1"),
        roundStable(expr(s"percentile($valueCol, 0.5)"), 6).as("median"),
        roundStable(expr(s"percentile($valueCol, 0.75)"), 6).as("q3"),
        count(lit(1)).as("n"))

  /** Per-key ordinary-least-squares trend line of `yCol` on `xCol`:
    * slope, intercept, r², n — the "is this metric drifting" primitive
    * over arbitrarily many series at once. Population-moment
    * definitions (slope = covar_pop/var_pop), matching SQL's
    * `regr_slope`/`regr_intercept`/`regr_r2` exactly.
    *
    * Scale shape: `covar_pop`/`var_pop`/`corr`/`avg` are all
    * DeclarativeAggregates — ONE pass, map-side partials, one shuffle
    * on the key. No per-key sort, no window: a million series over
    * 100 TB costs the same scan as a count.
    */
  def olsTrend(df: DataFrame, keys: Seq[String], xCol: Column, yCol: Column,
               decimals: Int = 6): DataFrame = {
    val slope = covar_pop(yCol, xCol) / var_pop(xCol)
    df.groupBy(keys.map(col): _*)
      .agg(
        roundStable(slope, decimals).as("slope"),
        roundStable(avg(yCol) - slope * avg(xCol), decimals).as("intercept"),
        roundStable(pow(corr(xCol, yCol), 2), decimals).as("r2"),
        count(lit(1)).as("n"))
  }

  /** Theil-Sen robust trend per key — the 50%-breakdown twin of
    * [[olsTrend]]: slope = MEDIAN of all pairwise slopes
    * `(v_j − v_i)/(x_j − x_i)` over the per-hour mean series, intercept
    * = median of `v − slope·x` (Sen 1968). One wild reading tilts an
    * OLS fit; here up to ~29% of the series can be corrupt before the
    * estimate moves — the trend you actually want from a misbehaving
    * sensor.
    *
    * Scale shape: the pairwise self-join runs over the AGGREGATED
    * per-(key, hour) series, so pair count is O(hours²) per key —
    * bounded by the CALENDAR, not the data volume (a year is ~38M pairs
    * per key, and the raw 100 TB is touched exactly once by the first
    * keyed agg). x is epoch-hours as double: both engines difference
    * identical values, and `median` interpolates identically over the
    * identical slope multiset. Keys with < 2 distinct hours emit NULL
    * slope/intercept (no pair to vote — the σ=0 convention), n_pairs 0.
    */
  def theilSen(df: DataFrame, keys: Seq[String], tsCol: Column,
               valueCol: String, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val hourly = df
      .groupBy(keyCols :+ date_trunc("hour", tsCol).as("__h"): _*)
      .agg(avg(col(valueCol)).as("__v"))
      .withColumn("__x", unix_micros(col("__h")).cast("double") / 3.6e9)
    val a = hourly.select(keyCols :+ col("__x").as("__x1") :+
      col("__v").as("__v1"): _*)
    val b = hourly.select(keyCols :+ col("__x").as("__x2") :+
      col("__v").as("__v2"): _*)
    val slopes = a.join(b, keys).filter(col("__x2") > col("__x1"))
      .withColumn("__s",
        (col("__v2") - col("__v1")) / (col("__x2") - col("__x1")))
      .groupBy(keyCols: _*)
      .agg(expr("percentile(__s, 0.5)").as("__slope"),
        count(lit(1)).as("__np"))
    hourly.join(slopes, keys, "left")
      .withColumn("__r", col("__v") - col("__slope") * col("__x"))
      .groupBy(keyCols: _*)
      .agg(roundStable(max(col("__slope")), decimals).as("slope_per_hour"),
        roundStable(expr("percentile(__r, 0.5)"), decimals).as("intercept"),
        count(lit(1)).as("n_hours"),
        coalesce(max(col("__np")), lit(0L)).as("n_pairs"))
  }

  /** Trimmed and winsorized means per key — the robust-location ladder's
    * remaining rungs (plain mean → A29 median → A37 MAD flags → these):
    * `trimmed_mean` averages only values inside the [lo, hi] quantile
    * band (discard the tails), `winsor_mean` CLAMPS the tails to the
    * band edges instead (keep the observation, cap its influence) — the
    * standard pair for contaminated sensor feeds where the median
    * throws away too much and the mean believes every glitch.
    *
    * Two keyed passes by necessity (the band depends on the key's own
    * quantiles): one exact-percentile agg, then the bound join rides
    * AQE's broadcast (#keys rows) over the same scan. Interpolated
    * exact percentiles — identical to the oracle's `quantile_cont`.
    */
  def trimmedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                   lo: Double = 0.1, hi: Double = 0.9,
                   decimals: Int = 6): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val keyCols = keys.map(col)
    val bounds = df.groupBy(keyCols: _*)
      .agg(expr(s"percentile($valueCol, $lo)").as("__lo"),
        expr(s"percentile($valueCol, $hi)").as("__hi"))
    val v = col(valueCol)
    df.join(bounds, keys)
      .groupBy(keyCols: _*)
      .agg(
        roundStable(avg(v), decimals).as("mean"),
        roundStable(avg(when(v >= col("__lo") && v <= col("__hi"), v)),
          decimals).as("trimmed_mean"),
        roundStable(avg(greatest(least(v, col("__hi")), col("__lo"))),
          decimals).as("winsor_mean"),
        roundStable(max(col("__lo")), decimals).as("q_lo"),
        roundStable(max(col("__hi")), decimals).as("q_hi"),
        count(v).as("n"))
  }

  /** Kaplan-Meier survival estimator per key (Kaplan & Meier 1958) —
    * right-censored retention/churn curves done correctly: treating a
    * still-active user as churned-at-last-sighting biases every curve
    * down, and dropping them biases it up; KM discounts the at-risk set
    * instead. Input: ONE ROW PER SUBJECT with its observation length
    * (`durationCol`) and whether the terminal event was OBSERVED
    * (`observedCol` true) or the subject was CENSORED there (false —
    * still alive at the horizon). Output per (key, t): at-risk count,
    * observed events, censored, and `S(t) = Π_{t_j ≤ t} (1 − d_j/n_j)`.
    *
    * Shape: one keyed agg to per-duration rows (state O(#distinct
    * durations) — the raw subjects reduce FIRST), then two cumulative
    * windows over the same keyed sort: at-risk = reverse-cumulative
    * subjects, survival = exp of the cumulative Σ ln(1 − d/n) (d = 0
    * rows contribute ln 1 = 0, so no row filtering); a factor hitting
    * exactly 0 (everyone at risk dies) pins S to 0 via a cumulative-min
    * guard rather than ln(0). Both engines replay the identical
    * exp/Σln expression tree.
    */
  def kaplanMeier(df: DataFrame, keys: Seq[String], durationCol: String,
                  observedCol: Column, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val byT = df.groupBy(keyCols :+ col(durationCol).as("t"): _*)
      .agg(sum(when(observedCol, 1L).otherwise(0L)).as("__d"),
        sum(when(observedCol, 0L).otherwise(1L)).as("__c"))
    val wCum = Window.partitionBy(keyCols: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRev = Window.partitionBy(keyCols: _*).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val nRisk = sum(col("__d") + col("__c")).over(wRev)
    val factor = lit(1.0) - col("__d").cast("double") / col("__n")
    byT
      .withColumn("__n", nRisk)
      .withColumn("__f", factor)
      .withColumn("__dead", min(col("__f")).over(wCum) <= 0.0)
      .withColumn("survival", graft.functions.roundStable(
        when(col("__dead"), 0.0).otherwise(
          exp(sum(when(col("__f") > 0, log(col("__f"))).otherwise(0.0))
            .over(wCum))), decimals))
      .select(keyCols ++ Seq(col("t"), col("__n").as("n_risk"),
        col("__d").as("n_events"), col("__c").as("n_censored"),
        col("survival")): _*)
  }

  /** EXACT per-key median with BOUNDED executor memory at ANY group
    * size — the scale-out of `percentile(v, 0.5)`, whose
    * implementation materializes every value of a group in one task's
    * memory (fine at millions, an OOM at a 100 TB key). Two passes,
    * both bounded:
    *
    *   1. histogram: per-key n/min/max + per-(key, bin) counts —
    *      map-side partial aggregation, O(bins) state per key;
    *   2. the candidate bin(s): cumulative counts locate which bin(s)
    *      hold the interpolation ranks `⌊(n+1)/2⌋`/`⌈(n+1)/2⌉`; ONLY
    *      rows falling in those bins re-scan into a per-(key, bin)
    *      rank window — ~n/bins rows per key, bounded by construction —
    *      and the global rank is the bin's cumulative offset plus the
    *      within-bin rank.
    *
    * Result is the exact interpolated median (even n: mean of the two
    * middle order statistics — identical to `percentile(0.5)` and the
    * oracle's `median`), provable because rank arithmetic is exact;
    * the histogram only NARROWS, never approximates. NULLs excluded.
    */
  def scalableMedian(df0: DataFrame, keys: Seq[String], valueCol: String,
                     bins: Int = 1000, decimals: Int = 6): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val keyCols = keys.map(col)
    val df = df0.filter(col(valueCol).isNotNull)
    val rng = df.groupBy(keyCols: _*)
      .agg(count(col(valueCol)).as("__n"), min(col(valueCol)).as("__lo"),
        max(col(valueCol)).as("__hi"))
    val binOf = Drift.binId(col(valueCol), col("__lo"), col("__hi"), bins)
    val hist = df.join(broadcast(rng), keys)
      .withColumn("__bin", binOf)
      .groupBy(keyCols :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"), max(col("__n")).as("__n"))
    val wCumB = Window.partitionBy(keyCols: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // 1-based interpolation ranks: odd n -> one rank, even n -> the two
    // middle order statistics (what percentile(0.5) averages)
    val r1 = floor((col("__n") + 1) / 2)
    val r2 = ceil((col("__n") + lit(1.0)) / 2).cast("long")
    val cand = hist
      .withColumn("__below", coalesce(sum(col("__cnt")).over(wCumB), lit(0L)))
      .filter((col("__below") < r1 && col("__below") + col("__cnt") >= r1) ||
        (col("__below") < r2 && col("__below") + col("__cnt") >= r2))
      .select(keyCols ++ Seq(col("__bin"), col("__below"), col("__n")): _*)
    val wInBin = Window.partitionBy(keyCols :+ col("__bin"): _*)
      .orderBy(col(valueCol))
    df.join(broadcast(rng.drop("__n")), keys)
      .withColumn("__bin", binOf)
      .join(cand, keys :+ "__bin")
      .withColumn("__rk", col("__below") + row_number().over(wInBin))
      .filter(col("__rk") === r1 || col("__rk") === r2)
      .groupBy(keyCols: _*)
      .agg(roundStable(avg(col(valueCol)), decimals).as("median"),
        max(col("__n")).as("n"))
  }

  /** [[scalableMedian]] generalized to ANY quantile — exact
    * `percentile(p)` semantics (linear interpolation at rank
    * `(n−1)·p`) with BOUNDED memory at any group size: the per-key
    * histogram locates the bin(s) holding the two interpolation order
    * statistics, only that ~n/bins sliver re-ranks. The p99.9 SLO
    * number, EXACT, on a key whose values would OOM a
    * `percentile()` buffer. Interpolation arithmetic (`(n−1)·p`,
    * fraction g, `v_lo + g·(v_hi − v_lo)`) is the textbook continuous
    * form both engines define — the oracle's plain `quantile_cont` IS
    * the exactness proof.
    */
  def scalableQuantile(df0: DataFrame, keys: Seq[String], valueCol: String,
                       p: Double, bins: Int = 1000,
                       decimals: Int = 6): DataFrame = {
    require(p >= 0 && p <= 1, s"need 0 <= p <= 1, got $p")
    require(bins >= 2, s"need bins >= 2, got $bins")
    val keyCols = keys.map(col)
    val df = df0.filter(col(valueCol).isNotNull)
    val rng = df.groupBy(keyCols: _*)
      .agg(count(col(valueCol)).as("__n"), min(col(valueCol)).as("__lo"),
        max(col(valueCol)).as("__hi"))
    val binOf = Drift.binId(col(valueCol), col("__lo"), col("__hi"), bins)
    val hist = df.join(broadcast(rng), keys)
      .withColumn("__bin", binOf)
      .groupBy(keyCols :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"), max(col("__n")).as("__n"))
    val wCumB = Window.partitionBy(keyCols: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // 1-based bracketing ranks of the (n-1)*p interpolation index
    val h = (col("__n") - 1).cast("double") * p
    val r1 = (floor(h) + 1).cast("long")
    val r2 = (ceil(h) + 1).cast("long")
    val g = h - floor(h)
    val cand = hist
      .withColumn("__below", coalesce(sum(col("__cnt")).over(wCumB), lit(0L)))
      .filter((col("__below") < r1 && col("__below") + col("__cnt") >= r1) ||
        (col("__below") < r2 && col("__below") + col("__cnt") >= r2))
      .select(keyCols ++ Seq(col("__bin"), col("__below"), col("__n")): _*)
    val wInBin = Window.partitionBy(keyCols :+ col("__bin"): _*)
      .orderBy(col(valueCol))
    df.join(broadcast(rng.drop("__n")), keys)
      .withColumn("__bin", binOf)
      .join(cand, keys :+ "__bin")
      .withColumn("__rk", col("__below") + row_number().over(wInBin))
      .filter(col("__rk") === r1 || col("__rk") === r2)
      .groupBy(keyCols: _*)
      .agg(
        roundStable(
          min(when(col("__rk") === r1, col(valueCol))) +
            max(g) * (max(when(col("__rk") === r2, col(valueCol))) -
              min(when(col("__rk") === r1, col(valueCol)))),
          decimals).as("quantile"),
        max(col("__n")).as("n"))
  }

  /** Binned scatter ("binscatter", the econometrics workhorse —
    * Cattaneo et al. 2024 formalize it): x cut into `parts` EQUAL-MASS
    * buckets by explicit rank arithmetic per key (the A63 convention —
    * never ntile), each bucket reporting mean x, mean y, and the
    * 95% CI of the conditional mean — the nonparametric "what does y
    * do as x rises" curve that a scatter plot of 10¹⁰ points can't
    * draw and a global correlation flattens away. One keyed rank
    * window + one closing agg; buckets with n < 2 have no sample sd →
    * NULL CI, mean still real.
    */
  def binScatter(df: DataFrame, keys: Seq[String], xCol: Column,
                 yCol: Column, tieCol: Column, parts: Int = 20,
                 decimals: Int = 6): DataFrame = {
    require(parts >= 2, s"need parts >= 2, got $parts")
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(xCol, tieCol)
    val wAll = Window.partitionBy(keyCols: _*)
    val se = stddev_samp(col("__y")) / sqrt(count(lit(1)).cast("double"))
    df.filter(xCol.isNotNull && yCol.isNotNull)
      .withColumn("__x", xCol).withColumn("__y", yCol)
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("bucket", expr(s"(__rn - 1) * $parts DIV __n"))
      .groupBy(keyCols :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        roundStable(avg(col("__x")), decimals).as("x_mean"),
        roundStable(avg(col("__y")), decimals).as("y_mean"),
        roundStable(se, decimals).as("y_se"),
        roundStable(avg(col("__y")) - lit(1.96) * se, decimals).as("ci_lo"),
        roundStable(avg(col("__y")) + lit(1.96) * se, decimals).as("ci_hi"))
  }

  /** Deterministic Poisson bootstrap CI for the mean (Efron's bootstrap
    * in the Poissonized form every distributed implementation uses —
    * Chamandy et al., Google 2012): each of `reps` replicas reweights
    * every row by a Poisson(1) draw, and the α/2 and 1−α/2 EXACT order
    * statistics of the replica means are the CI — no normality
    * assumption, no closed-form SE needed (medians of ratios, trimmed
    * things, whatever the metric is). The draw is DETERMINISTIC:
    * uniform from the md5 hex prefix of `(id, replica)` (the C77
    * engine-shared hash) inverted through the Poisson(1) CDF with
    * PINNED literal thresholds (the ln-2 lesson) — reproducible on any
    * engine, no RNG state.
    *
    * Cost, stated plainly: a `reps`× map-side explode feeding one
    * (keys, replica) aggregation (combiner-reduced), then
    * O(#keys·reps) rows rank. Replica means rounded 9dp before
    * ranking (tie stability); a replica whose weights all drew 0
    * (possible at tiny n) is NULL and excluded with a visible count.
    */
  def bootstrapMeanCi(df: DataFrame, keys: Seq[String], valueCol: String,
                      idCol: Column, reps: Int = 50, alpha: Double = 0.05,
                      digits: Int = 6): DataFrame = {
    require(reps >= 10, s"need reps >= 10, got $reps")
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    val keyCols = keys.map(col)
    val u = conv(substring(md5(concat(idCol.cast("string"), lit("#"),
      col("__b").cast("string"))), 1, 10), 16, 10).cast("double") /
      lit(1099511627776.0) // 2^40
    // Poisson(1) CDF, pinned literals: P(<=k) for k = 0..5, else 6
    val w = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .otherwise(6L)
    val replicas = df.filter(col(valueCol).isNotNull)
      .withColumn("__b", explode(array((0 until reps).map(lit(_)): _*)))
      .withColumn("__w", w)
      .groupBy(keyCols :+ col("__b"): _*)
      .agg(sum(col("__w") * col(valueCol)).as("__sw"),
        sum(col("__w")).as("__w0"), count(lit(1)).as("__n"))
      .withColumn("__m", roundStable(
        when(col("__w0") > 0, col("__sw") / col("__w0")), 9))
    val live = replicas.filter(col("__m").isNotNull)
    val wOrd = Window.partitionBy(keyCols: _*)
      .orderBy(col("__m"), col("__b"))
    val wAll = Window.partitionBy(keyCols: _*)
    // DOUBLE literals via lit(), never SQL-text decimals — a decimal
    // 0.025 ceils differently than the IEEE double at exact multiples
    // (the q197 lesson, on our own side this time)
    val rLo = ceil(col("__nb") * lit(alpha / 2)).cast("long")
    val rHi = ceil(col("__nb") * lit(1.0 - alpha / 2)).cast("long")
    val ranked = live
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__nb", count(lit(1)).over(wAll))
      .filter(col("__rn") === greatest(rLo, lit(1L)) || col("__rn") === rHi)
    val plain = df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols: _*)
      .agg(roundStable(avg(col(valueCol)), digits).as("mean"),
        count(lit(1)).as("n"))
    plain.join(
      ranked.groupBy(keyCols: _*)
        .agg(roundStable(min(col("__m")), digits).as("ci_lo"),
          roundStable(max(col("__m")), digits).as("ci_hi"),
          max(col("__nb")).as("n_reps")),
      keys, "left")
  }

  /** Metric-delta contribution report — the "why did the number move"
    * decomposition every metrics review starts with: the total between
    * the reference window and the current one moved by Δ; which
    * segments DROVE it? Per segment: both totals, the delta, the
    * segment's share of the total ABSOLUTE movement (stable even when
    * offsetting segments cancel the net — the case where a naive
    * share-of-net divides by ~0 and explodes), and the rank by
    * |delta| — ROUNDED before ranking with a full-segment tiebreak
    * (the q94 discipline: raw double sums differ across summation
    * orders by ulps, enough to swap two near-tied ranks between
    * engines). One conditional aggregation + windows over the segment
    * rows (O(#segments) after the agg — the corpus is scanned once).
    */
  def contribution(df: DataFrame, segCols: Seq[String], valueCol: String,
                   isRef: Column, digits: Int = 6): DataFrame = {
    val segs = segCols.map(col)
    val wAll = Window.partitionBy()
    val base = df
      .groupBy(segs: _*)
      .agg(sum(when(isRef, col(valueCol)).otherwise(lit(0.0))).as("__r"),
        sum(when(!isRef, col(valueCol)).otherwise(lit(0.0))).as("__c"))
      .withColumn("__d", col("__c") - col("__r"))
      .withColumn("__totAbs", sum(abs(col("__d"))).over(wAll))
      .withColumn("__rank", row_number().over(
        Window.orderBy(roundStable(abs(col("__d")), digits).desc +: segs: _*)))
    base.select(segs ++ Seq(
      roundStable(col("__r"), digits).as("ref_total"),
      roundStable(col("__c"), digits).as("cur_total"),
      roundStable(col("__d"), digits).as("delta"),
      roundStable(when(col("__totAbs") > 0,
        abs(col("__d")) / col("__totAbs")), digits).as("abs_share"),
      col("__rank").cast("long").as("rank")): _*)
  }

  /** Cohen's d and Hedges' g per key between the `isA` arm and the
    * rest — the MAGNITUDE companion to [[welchTTest]]'s significance:
    * at 100 TB everything is significant, and the only question left
    * is whether the difference is big enough to matter (d ≈ 0.2
    * small / 0.5 medium / 0.8 large). Pooled-SD standardized mean
    * difference, plus Hedges' small-sample correction
    * `g = d·(1 − 3/(4n − 9))` — the bias term reviewers ask for on
    * small cohorts and that vanishes at scale. One conditional
    * aggregation; keys where either arm has < 2 rows or the pooled
    * variance is 0 emit NULL effect sizes with the counts visible.
    */
  def effectSize(df: DataFrame, keys: Seq[String], isA: Column,
                 yCol: Column, digits: Int = 6): DataFrame = {
    val a = when(isA, yCol)
    val b = when(!isA, yCol)
    val (na, nb) = (count(a), count(b))
    val n = (na + nb).cast("double")
    val pooledVar = ((na - 1).cast("double") * var_samp(a) +
      (nb - 1).cast("double") * var_samp(b)) / (n - 2)
    val d = when(na >= 2 && nb >= 2 && pooledVar > 0,
      (avg(a) - avg(b)) / sqrt(pooledVar))
    df.groupBy(keys.map(col): _*)
      .agg(
        na.as("n_a"), nb.as("n_b"),
        roundStable(avg(a), digits).as("mean_a"),
        roundStable(avg(b), digits).as("mean_b"),
        roundStable(d, digits).as("cohen_d"),
        roundStable(d * (lit(1.0) - lit(3.0) / (lit(4.0) * n - 9)),
          digits).as("hedges_g"))
  }

  /** ABC / Pareto classification per key — the inventory-and-traffic
    * workhorse next to [[gini]]'s scalar: rank items by value
    * descending, class A = the head items that carry the first `aCut`
    * (default 80%) of total value, B = up to `bCut` (95%), C = the
    * tail; report per (key, class): item count, class total, share.
    * An item's class comes from the cumulative share BEFORE it (so the
    * first item is always A, even when it alone exceeds the cut — the
    * textbook convention), with the cumulative ROUNDED at 9dp before
    * the threshold compare so a boundary item classifies identically
    * on every engine (running double sums agree in order but not
    * always in the last ulp).
    *
    * Shape: item rollup first (O(#items) after the agg), one keyed
    * (rounded value desc, id) window for rank + running total, closing
    * class agg on the same partitioning. Keys with zero/negative total
    * emit NULL class rows with counts — no mass to classify.
    */
  def abcClasses(df: DataFrame, keys: Seq[String], idCol: Column,
                 valueCol: String, aCut: Double = 0.8, bCut: Double = 0.95,
                 digits: Int = 6): DataFrame = {
    require(aCut > 0 && aCut < bCut && bCut < 1,
      s"need 0 < aCut < bCut < 1, got ($aCut, $bCut)")
    val keyCols = keys.map(col)
    val items = df.groupBy(keyCols :+ idCol.as("__id"): _*)
      .agg(sum(col(valueCol)).as("__v"))
      .withColumn("__vr", roundStable(col("__v"), digits))
    val wOrd = Window.partitionBy(keyCols: _*)
      .orderBy(col("__vr").desc, col("__id"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val tot = sum(col("__v")).over(wAll)
    val prevShare = roundStable(
      (sum(col("__v")).over(wCum) - col("__v")) / tot, 9)
    val cls = when(tot > 0,
      when(prevShare < aCut, "A").when(prevShare < bCut, "B")
        .otherwise("C"))
    items
      .withColumn("__cls", cls)
      .withColumn("__tot", tot)
      .groupBy(keyCols :+ col("__cls").as("abc_class"): _*)
      .agg(count(lit(1)).as("n_items"),
        roundStable(sum(col("__v")), digits).as("class_total"),
        roundStable(when(max(col("__tot")) > 0,
          sum(col("__v")) / max(col("__tot"))), digits).as("share"))
  }

  /** Inter-arrival process census per key — "is this stream actually
    * Poisson?": the assumption behind every rate monitor (A43 scores
    * AGAINST a Poisson λ; this checks whether the process earns the
    * model). Gaps between consecutive events (seconds), their mean,
    * coefficient of variation (≈ 1 memoryless / < 1 regular-metronome
    * / > 1 clumped), and the Goh–Barabási burstiness
    * `B = (σ − μ)/(σ + μ)` ∈ (−1, 1) — the bounded form the
    * human-dynamics literature reports (0 Poisson, → 1 heavy bursts,
    * → −1 clockwork). One keyed lag window + one agg on its
    * partitioning; keys with < 3 events (< 2 gaps) emit NULL spread
    * statistics with counts visible.
    */
  def interArrival(df: DataFrame, keys: Seq[String], tsCol: Column,
                   tieCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(tsCol, tieCol)
    val gap = (unix_micros(tsCol) -
      unix_micros(lag(tsCol, 1).over(wOrd))).cast("double") / 1e6
    val staged = df.withColumn("__g", gap)
    val mu = avg(col("__g"))
    val sd = stddev_samp(col("__g"))
    val ok = count(col("__g")) >= 2 && mu > 0
    staged
      .groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_events"),
        count(col("__g")).as("n_gaps"),
        roundStable(mu, digits).as("mean_gap_s"),
        roundStable(when(ok, sd / mu), digits).as("cv"),
        roundStable(when(ok, (sd - mu) / (sd + mu)), digits)
          .as("b_burstiness"))
  }

  /** Distribution-free confidence interval for a quantile per key —
    * the companion to [[bootstrapMeanCi]] for ORDER statistics: the
    * p99 SLO number ships with error bars that assume NOTHING about
    * the tail's shape, from the classic order-statistic recipe: the
    * interval between the `⌈np − z√(np(1−p))⌉`-th and
    * `⌈np + z√(np(1−p))⌉`-th smallest values covers the true quantile
    * with ≈ the nominal confidence (binomial counts, normal-
    * approximated — the textbook large-n form, stated as such). Ranks
    * are INTEGERS computed identically on both engines, so the CI
    * endpoints are exact data values, no resampling, no interpolation
    * ambiguity; the point estimate is the usual interpolated exact
    * percentile. One keyed rank window + a tiny percentile agg joined
    * back; tiny keys clamp to [1, n] (degenerate-but-visible CI).
    */
  def quantileCi(df: DataFrame, keys: Seq[String], valueCol: String,
                 p: Double = 0.5, z: Double = 1.96,
                 digits: Int = 6): DataFrame = {
    require(p > 0 && p < 1, s"need 0 < p < 1, got $p")
    require(z > 0, s"need z > 0, got $z")
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(keyCols: _*)
    val n = count(lit(1)).over(wAll)
    val nd = n.cast("double")
    val spread = lit(z) * sqrt(nd * lit(p) * lit(1.0 - p))
    val loR = greatest(ceil(nd * lit(p) - spread), lit(1L))
    val hiR = least(ceil(nd * lit(p) + spread), n)
    val picked = df
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__lo", loR).withColumn("__hi", hiR)
      .withColumn("__n", n)
      .filter(col("__rn") === col("__lo") || col("__rn") === col("__hi"))
      .groupBy(keyCols: _*)
      .agg(roundStable(min(col(valueCol)), digits).as("ci_lo"),
        roundStable(max(col(valueCol)), digits).as("ci_hi"),
        max(col("__lo")).as("lo_rank"), max(col("__hi")).as("hi_rank"),
        max(col("__n")).as("n"))
    val point = df.groupBy(keyCols: _*)
      .agg(roundStable(expr(s"percentile($valueCol, ${p}D)"), digits)
        .as("point"))
    point.join(picked, keys)
      .select(keyCols ++ Seq(col("point"), col("ci_lo"), col("ci_hi"),
        col("lo_rank"), col("hi_rank"), col("n")): _*)
  }

  /** Seasonal and trend STRENGTH per key (Hyndman & Athanasopoulos,
    * fpp3 §4.4, adapted to the A25 hour-of-day decomposition): the two
    * [0,1] scalars that say whether the A25 components MATTER —
    * `F_seasonal = max(0, 1 − Var(resid)/Var(detrended))` (how much of
    * the detrended variance the hourly pattern explains) and
    * `F_trend = max(0, 1 − Var(resid)/Var(deseasonalized))`. The
    * fleet-scan form of the question q88 answers one key at a time by
    * eyeball: WHICH of 10⁵ sensors actually have a daily cycle worth
    * modeling. Identical staging to [[seasonalDecompose]] but with
    * UNROUNDED components (this is a closing aggregate, not a dump —
    * rounding belongs at the output); zero-variance keys emit NULL
    * ("no variance to explain" visible).
    */
  def seasonalStrength(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valueCol: String,
                       halfWindow: Int = 12, digits: Int = 6): DataFrame = {
    val wTrend = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-halfWindow, halfWindow)
    val series = df
      .withColumn("__trend", avg(col(valueCol)).over(wTrend))
      .withColumn("__detr", col(valueCol) - col("__trend"))
      .withColumn("__hh", hour(col(tsCol)))
    val seasonal = series.groupBy(col(keyCol), col("__hh"))
      .agg(avg(col("__detr")).as("__seas"))
    val joined = series.join(broadcast(seasonal), Seq(keyCol, "__hh"))
      .withColumn("__resid", col("__detr") - col("__seas"))
      .withColumn("__deseas", col(valueCol) - col("__seas"))
    val vResid = var_pop(col("__resid"))
    val vDetr = var_pop(col("__detr"))
    val vDeseas = var_pop(col("__deseas"))
    joined.groupBy(col(keyCol))
      .agg(
        roundStable(when(vDetr > 0,
          greatest(lit(0.0), lit(1.0) - vResid / vDetr)), digits)
          .as("strength_seasonal"),
        roundStable(when(vDeseas > 0,
          greatest(lit(0.0), lit(1.0) - vResid / vDeseas)), digits)
          .as("strength_trend"),
        count(lit(1)).as("n"))
  }

  /** Two-regressor OLS per key by the closed-form normal equations —
    * the "trend, CONTROLLING FOR the confounder" upgrade of [[olsTrend]]
    * that one extra covariate buys (a rising daily series with a strong
    * hour-of-day cycle reads a biased slope unless the cycle is in the
    * model): centered population moments into the explicit 2×2 solve
    * `b = (X'X)⁻¹X'y`, intercept from the means, and R² via the
    * single-pass identity `(b₁·c₁y + b₂·c₂y)/Var(y)` — no residual
    * second scan. One aggregation, six moments. Collinear regressors
    * (determinant ≤ 0 after FP — Cauchy–Schwarz makes the true value
    * ≥ 0) emit NULL coefficients: "these two variables are the same
    * signal" is the visible answer, not a 1/0 blowup.
    */
  def ols2(df: DataFrame, keys: Seq[String], x1: Column, x2: Column,
           y: Column, digits: Int = 6): DataFrame = {
    val s11 = var_pop(x1)
    val s22 = var_pop(x2)
    val c12 = covar_pop(x1, x2)
    val c1y = covar_pop(x1, y)
    val c2y = covar_pop(x2, y)
    val det = s11 * s22 - c12 * c12
    val b1 = when(det > 0, (c1y * s22 - c2y * c12) / det)
    val b2 = when(det > 0, (c2y * s11 - c1y * c12) / det)
    df.groupBy(keys.map(col): _*)
      .agg(
        roundStable(b1, digits).as("b1"),
        roundStable(b2, digits).as("b2"),
        roundStable(avg(y) - b1 * avg(x1) - b2 * avg(x2), digits)
          .as("intercept"),
        roundStable(when(det > 0 && var_pop(y) > 0,
          (b1 * c1y + b2 * c2y) / var_pop(y)), digits).as("r2"),
        count(lit(1)).as("n"))
  }

  /** Brown–Forsythe (median-centered Levene) variance-equality test
    * per key — the SPREAD axis of the two-window drift family: CUSUM /
    * Mann-Whitney / Welch all watch the CENTER, but a sensor whose
    * mean holds while its noise doubles is failing too. Robust by
    * construction (absolute deviations from each group's own exact
    * MEDIAN — the Brown-Forsythe variant, which survives heavy tails
    * where classic Levene's mean-centering doesn't), then the textbook
    * two-group one-way F on those deviations:
    * `F = (N−2)·[n_a(z̄_a−z̄)² + n_b(z̄_b−z̄)²] / Σ_g Σ(z−z̄_g)²`
    * (≈ 3.85 at α 0.05 for large N). Two passes by necessity (the
    * centers depend on each group's own quantile — the A47 shape):
    * one medians agg broadcast back, one conditional aggregation.
    * Degenerate keys (either group < 2 rows, or zero within-group
    * deviation variance) emit NULL F with counts visible.
    */
  def levene(df: DataFrame, keys: Seq[String], isA: Column, yCol: Column,
             digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val meds = df.withColumn("__a", isA).withColumn("__y", yCol)
      .groupBy(keyCols: _*)
      .agg(expr("percentile(IF(__a, __y, NULL), 0.5D)").as("__ma"),
        expr("percentile(IF(NOT __a, __y, NULL), 0.5D)").as("__mb"))
    val z = when(col("__a"), abs(col("__y") - col("__ma")))
      .otherwise(abs(col("__y") - col("__mb")))
    val za = when(col("__a"), col("__z"))
    val zb = when(!col("__a"), col("__z"))
    val (na, nb) = (count(za).cast("double"), count(zb).cast("double"))
    val n = na + nb
    val zbarA = avg(za)
    val zbarB = avg(zb)
    val zbar = sum(col("__z")) / n
    val between = na * (zbarA - zbar) * (zbarA - zbar) +
      nb * (zbarB - zbar) * (zbarB - zbar)
    val within = na * var_pop(za) + nb * var_pop(zb)
    val f = when(na >= 2 && nb >= 2 && within > 0,
      (n - 2) * between / within)
    df.withColumn("__a", isA).withColumn("__y", yCol)
      .join(broadcast(meds), keys)
      .withColumn("__z", z)
      .groupBy(keyCols: _*)
      .agg(
        na.cast("long").as("n_a"), nb.cast("long").as("n_b"),
        roundStable(zbarA, digits).as("mean_absdev_a"),
        roundStable(zbarB, digits).as("mean_absdev_b"),
        roundStable(f, digits).as("f_stat"))
  }

  /** Rate/mix decomposition of a ratio metric's move between two
    * windows — the follow-up question [[contribution]] leaves open:
    * the overall average moved, but did the SEGMENTS' rates change
    * (rate effect), or did traffic just SHIFT toward segments that
    * were always different (mix effect)? The classic two-term split:
    * `Δoverall = Σ share_cur·(r_cur − r_ref) + Σ (share_cur −
    * share_ref)·r_ref` — an EXACT identity (spec-gated), which is the
    * whole point: the two columns sum to the observed move, no
    * residual. A segment absent on one side takes the PRESENT side's
    * rate for the missing one, so its rate effect is exactly 0 and
    * its entire contribution lands in mix — appearing/disappearing
    * traffic IS a mix story, and the identity survives. One
    * conditional aggregation + windows over segment rows.
    */
  def rateMix(df: DataFrame, segCols: Seq[String], valueCol: String,
              isRef: Column, digits: Int = 6): DataFrame = {
    val segs = segCols.map(col)
    val wAll = Window.partitionBy()
    val base = df
      .groupBy(segs: _*)
      .agg(sum(when(isRef, col(valueCol))).as("__sr"),
        count(when(isRef, lit(1))).as("__nr"),
        sum(when(!isRef, col(valueCol))).as("__sc"),
        count(when(!isRef, lit(1))).as("__nc"))
      .withColumn("__totr", sum(col("__nr")).over(wAll))
      .withColumn("__totc", sum(col("__nc")).over(wAll))
    val shareR = col("__nr").cast("double") / col("__totr")
    val shareC = col("__nc").cast("double") / col("__totc")
    val rateR0 = col("__sr") / col("__nr")
    val rateC0 = col("__sc") / col("__nc")
    val rateR = coalesce(rateR0, rateC0)
    val rateC = coalesce(rateC0, rateR0)
    base
      .withColumn("share_ref", roundStable(shareR, digits))
      .withColumn("share_cur", roundStable(shareC, digits))
      .withColumn("rate_ref", roundStable(rateR, digits))
      .withColumn("rate_cur", roundStable(rateC, digits))
      .withColumn("rate_effect",
        roundStable(shareC * (rateC - rateR), digits))
      .withColumn("mix_effect",
        roundStable((shareC - shareR) * rateR, digits))
      .select(segs ++ Seq(col("share_ref"), col("share_cur"),
        col("rate_ref"), col("rate_cur"), col("rate_effect"),
        col("mix_effect")): _*)
  }

  /** Pairwise audience-overlap matrix — "do these segments reach the
    * same people?": for every pair of categories, the distinct-entity
    * intersection, union, Jaccard, and lift
    * `|A∩B|·N / (|A|·|B|)` (1 = independent reach, > 1 = the same
    * crowd — the number a dedup'd campaign plan is built from).
    * Entities dedupe to distinct (entity, category) memberships FIRST
    * (the corpus reduces before any pairing), then one self-join on
    * the ENTITY enumerates only co-memberships an entity actually has
    * — #pairs per entity = C(its categories, 2), never all-pairs of
    * the corpus. N = total distinct entities (for lift). Pairs with
    * ZERO shared entities do not appear (nothing co-enumerates them)
    * — absence reads as "no overlap at all", stated here.
    */
  def audienceOverlap(df: DataFrame, entityCol: Column, catCol: Column,
                      digits: Int = 6): DataFrame = {
    val m = df.select(entityCol.as("__e"), catCol.as("__c")).distinct()
    val sizes = m.groupBy(col("__c")).agg(count(lit(1)).as("__sz"))
    val total = m.select(countDistinct(col("__e")).as("__N"))
    val pairs = m.as("x").join(m.as("y"), "__e")
      .filter(col("x.__c") < col("y.__c"))
      .groupBy(col("x.__c").as("cat_a"), col("y.__c").as("cat_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(sizes.select(col("__c").as("cat_a"), col("__sz").as("__na")),
        "cat_a")
      .join(sizes.select(col("__c").as("cat_b"), col("__sz").as("__nb")),
        "cat_b")
      .crossJoin(broadcast(total))
      .select(col("cat_a"), col("cat_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"), col("n_both"),
        (col("__na") + col("__nb") - col("n_both")).as("n_union"),
        roundStable(col("n_both").cast("double") /
          (col("__na") + col("__nb") - col("n_both")), digits)
          .as("jaccard"),
        roundStable(col("n_both").cast("double") * col("__N") /
          (col("__na") * col("__nb")), digits).as("lift"))
  }

  /** Two-proportion z-test per key — the conversion-rate A/B readout
    * (the single most-run test in industry, next to [[welchTTest]]'s
    * means): success share in the `isA` arm vs the rest,
    * `z = (p₁ − p₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂))` with the POOLED p̂
    * under the null (the textbook form), plus the unpooled 95% CI on
    * the difference (the effect size that ships with the verdict).
    * One conditional aggregation; degenerate keys (an empty arm, or
    * pooled p̂ ∈ {0, 1} — no variance under the null) emit NULL z
    * with all four counts visible.
    */
  def propTest(df: DataFrame, keys: Seq[String], isA: Column,
               isSuccess: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val n1 = sum(when(isA, 1L).otherwise(0L)).cast("double")
    val n2 = sum(when(!isA, 1L).otherwise(0L)).cast("double")
    val s1 = sum(when(isA && isSuccess, 1L).otherwise(0L)).cast("double")
    val s2 = sum(when(!isA && isSuccess, 1L).otherwise(0L)).cast("double")
    val p1 = s1 / n1
    val p2 = s2 / n2
    val pp = (s1 + s2) / (n1 + n2)
    val se0 = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n1 + lit(1.0) / n2))
    val seU = sqrt(p1 * (lit(1.0) - p1) / n1 + p2 * (lit(1.0) - p2) / n2)
    val ok = n1 > 0 && n2 > 0 && pp > 0 && pp < 1
    df.groupBy(keyCols: _*)
      .agg(
        n1.cast("long").as("n_a"), s1.cast("long").as("succ_a"),
        n2.cast("long").as("n_b"), s2.cast("long").as("succ_b"),
        roundStable(when(n1 > 0, p1), digits).as("p_a"),
        roundStable(when(n2 > 0, p2), digits).as("p_b"),
        roundStable(when(ok, (p1 - p2) / se0), digits).as("z"),
        roundStable(when(ok, (p1 - p2) - lit(1.96) * seU), digits)
          .as("diff_ci_lo"),
        roundStable(when(ok, (p1 - p2) + lit(1.96) * seU), digits)
          .as("diff_ci_hi"))
  }

  /** Per-key Welch two-sample t-test between the rows where `isA` and
    * the rest: t statistic, Welch–Satterthwaite degrees of freedom, and
    * a 1/0 significance verdict at |t| > `critical` — the A/B readout
    * as a single aggregation. Sample (n−1) moments, the textbook Welch
    * form; groups with < 2 observations on either side yield null t.
    *
    * Same scale shape as [[olsTrend]]: conditional aggregates
    * (`avg(when(isA, y))` …) keep it ONE pass / one shuffle — no
    * self-join of the two arms, which is how a naive A/B query doubles
    * its scan at 100 TB.
    */
  def welchTTest(df: DataFrame, keys: Seq[String], isA: Column, yCol: Column,
                 critical: Double = 1.96, decimals: Int = 4): DataFrame = {
    val a = when(isA, yCol)
    val b = when(!isA, yCol)
    val (na, nb) = (count(a), count(b))
    val sa = var_samp(a) / na
    val sb = var_samp(b) / nb
    val t = (avg(a) - avg(b)) / sqrt(sa + sb)
    val dfW = pow(sa + sb, 2) /
      (pow(sa, 2) / (na - lit(1)) + pow(sb, 2) / (nb - lit(1)))
    df.groupBy(keys.map(col): _*)
      .agg(
        na.as("n_a"), nb.as("n_b"),
        roundStable(avg(a) - avg(b), decimals).as("mean_diff"),
        roundStable(t, decimals).as("t_stat"),
        roundStable(dfW, decimals).as("df"),
        (abs(t) > critical).cast("long").as("significant"))
  }

  /** Per-key autocorrelation at the given lags (`corr(v_t, v_{t+lag})`
    * over the (orderCol, tieCol)-ordered series): the periodicity /
    * persistence readout — a daily-cycled sensor shows a peak at its
    * period's lag, white noise shows none, near-1 at lag 1 means the
    * series is smooth enough for delta encoding. One keyed window
    * shuffle builds ALL lag columns (each `lead` rides the same sorted
    * frame); the closing agg reuses the window's partitioning. `corr`
    * skips the frame-end rows whose lead is null on both engines.
    */
  def acf(df: DataFrame, keys: Seq[String], orderCol: Column, tieCol: Column,
          valueCol: Column, lags: Seq[Int], decimals: Int = 6): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"need lags >= 1, got $lags")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol, tieCol)
    val withLeads = lags.foldLeft(df.withColumn("__v", valueCol)) { (acc, l) =>
      acc.withColumn(s"__lead$l", lead(col("__v"), l).over(w))
    }
    withLeads.groupBy(keys.map(col): _*)
      .agg(
        roundStable(corr(col("__v"), col(s"__lead${lags.head}")), decimals)
          .as(s"acf_${lags.head}"),
        lags.tail.map(l =>
          roundStable(corr(col("__v"), col(s"__lead$l")), decimals)
            .as(s"acf_$l")) :+ count(lit(1)).as("n"): _*)
  }

  /** Per-key Mann–Whitney U test between the rows where `isA` and the
    * rest — the rank-based two-sample test that needs no normality
    * assumption ([[welchTTest]]'s robust sibling; the standard readout
    * when the metric is skewed, e.g. latency or spend). Exact
    * average-rank tie handling: rows group by VALUE first, each distinct
    * value's average rank is `(#strictly-below) + (#tied + 1)/2`, U
    * sums side-A ranks, and the normal approximation carries the full
    * tie-correction term `Σ(t³−t)` in its variance.
    *
    * Scale shape mirrors [[Drift.ksTest]]: one keyed (key, value) count
    * agg with conditional side counts — per-key state after it is
    * O(#distinct values) — then cumulative windows over those aggregated
    * rows. Nothing row-scale sorts.
    */
  def mannWhitneyU(df: DataFrame, keys: Seq[String], isA: Column, yCol: Column,
                   decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val counts = df
      .groupBy(keyCols :+ yCol.as("__v"): _*)
      .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
        sum(when(!isA, 1L).otherwise(0L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    // average rank of this value = (rows strictly below) + (ties + 1)/2
    val below = sum(col("__t")).over(wOrd) - col("__t")
    val avgRank = below.cast("double") + (col("__t") + lit(1)).cast("double") / 2
    val enriched = counts
      .withColumn("__ra", avgRank * col("__ca"))
      .withColumn("__tie", col("__t") * col("__t") * col("__t") - col("__t"))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
    val na = max(col("__na")).cast("double")
    val nb = max(col("__nb")).cast("double")
    val n = na + nb
    val u = sum(col("__ra")) - na * (na + 1) / 2
    val mu = na * nb / 2
    val sigma = sqrt(na * nb / 12 *
      ((n + 1) - sum(col("__tie")).cast("double") / (n * (n - 1))))
    // σ = 0 when a side is empty or every row ties on one value — the
    // normal approximation is undefined there, so z is an explicit NULL
    // (the Drift.cusum sd>0 guard convention) instead of a NaN/null from
    // a silent 0/0 that roundStable would pass through.
    enriched
      .groupBy(keyCols: _*)
      .agg(
        roundStable(u, decimals).as("u_stat"),
        roundStable(when(sigma > 0, (u - mu) / sigma), decimals).as("z"),
        max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"))
  }

  /** Trailing-window Pearson correlation between two series per key —
    * the co-movement monitor (price vs volume per account, two sensor
    * channels per station): `corr(x, y)` over the last `window` rows of
    * the (orderCol, tieCol) sort. Emits ONLY full-window rows
    * (row_number ≥ window, one more expression on the same window
    * spec): a partial leading frame degenerates (n=1 → undefined) and
    * both engines' small-n conventions differ, so the contract is
    * "exact-N trailing correlation" and the first N−1 rows are warm-up.
    * ONE keyed window shuffle; corr over the frame is the built-in
    * declarative aggregate — codegen'd moments, no UDF. A constant
    * series inside a frame yields NULL (0 variance), passed through.
    */
  def rollingCorr(df: DataFrame, keys: Seq[String], orderCol: Column,
                  tieCol: Column, xCol: String, yCol: String,
                  window: Int, decimals: Int = 6): DataFrame = {
    require(window >= 2, s"need window >= 2, got $window")
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
    val frame = wOrd.rowsBetween(-(window - 1), Window.currentRow)
    // explicit frame moments instead of the built-in corr: (a) Spark's
    // Corr leaves its closing division unguarded, so a zero-variance
    // warm-up frame (two equal y values) THROWS under ANSI even though
    // those rows are filtered right after; (b) both engines then run
    // the IDENTICAL formula rather than two engine conventions. All six
    // aggregates share the one frame → one Window node, one shuffle.
    val n = count(lit(1)).over(frame).cast("double")
    val sx = sum(col(xCol)).over(frame)
    val sy = sum(col(yCol)).over(frame)
    val sxy = sum(col(xCol) * col(yCol)).over(frame)
    val sxx = sum(col(xCol) * col(xCol)).over(frame)
    val syy = sum(col(yCol) * col(yCol)).over(frame)
    val den = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__c", when(den > 0, (n * sxy - sx * sy) / den))
      .filter(col("__rn") >= window)
      .select(keyCols ++ Seq(orderCol, tieCol,
        roundStable(col("__c"), decimals).as("rolling_corr")): _*)
  }

  /** Seasonal-naive forecast error per key — the forecastability /
    * seasonality-strength readout over an hourly series: aggregate to
    * per-(key, hour) means, then score two zero-parameter forecasts —
    * "same hour yesterday" (lag 24 h) and "previous hour" (lag 1 h) —
    * by mean absolute error, plus their ratio `mase24` (the MASE idea
    * with the 1-hour naive as scale): < 1 means daily seasonality
    * explains more than short-term persistence, ≈ the series is
    * daily-cyclic. Lags are EXACT-hour self-joins on the aggregated
    * series (hour − INTERVAL), not row lags — a gap in the hour grid
    * must not slide the comparison window (the q95 lesson: row-lag on a
    * gappy series compares across outages). Per-key state after the
    * first agg is O(#hours); the joins ride the aggregated table.
    */
  def seasonalNaiveError(df: DataFrame, keys: Seq[String], tsCol: Column,
                         valueCol: String, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val hourly = df
      .groupBy(keyCols :+ date_trunc("hour", tsCol).as("__h"): _*)
      .agg(avg(col(valueCol)).as("__v"))
    val cur = hourly.select(keyCols :+ col("__h") :+ col("__v"): _*)
    def lagged(hours: Int, as: String) = hourly.select(
      keyCols :+ (col("__h") + expr(s"INTERVAL $hours HOURS")).as("__h") :+
        col("__v").as(as): _*)
    cur
      .join(lagged(24, "__v24"), keys :+ "__h", "left")
      .join(lagged(1, "__v1"), keys :+ "__h", "left")
      .groupBy(keyCols: _*)
      .agg(
        roundStable(avg(abs(col("__v") - col("__v24"))), decimals)
          .as("mae_24h"),
        roundStable(avg(abs(col("__v") - col("__v1"))), decimals)
          .as("mae_1h"),
        roundStable(when(avg(abs(col("__v") - col("__v1"))) > 0,
          avg(abs(col("__v") - col("__v24"))) /
            avg(abs(col("__v") - col("__v1")))), decimals).as("mase24"),
        count(col("__v24")).as("n_24h"), count(col("__v1")).as("n_1h"),
        count(lit(1)).as("n_hours"))
  }

  /** Seasonal-naive forecast BAND per key — [[seasonalNaiveError]]
    * screens whether "same hour yesterday" forecasts at all; this
    * emits the per-bucket forecast WITH its empirical prediction
    * interval: band = forecast ± the key's `q`-quantile of |residual|
    * (exact percentile — the distribution-free interval that needs no
    * normality story), and an `outside_band` flag for actuals beyond
    * it — the alerting layer on top of the forecast. Exact-hour
    * self-join, NOT a row lag (a grid gap must not slide the
    * comparison — the q95 lesson); the flag compares 6dp-ROUNDED
    * |residual| to the 6dp-rounded band radius so both engines flag
    * identical buckets. Shape: one hourly agg, one equi-join on the
    * shifted hour, one per-key percentile window over the O(#keys ×
    * #hours) series.
    */
  def forecastBand(df: DataFrame, keys: Seq[String], tsCol: Column,
                   valueCol: String, q: Double = 0.95,
                   digits: Int = 6): DataFrame = {
    require(q > 0 && q < 1, s"need 0 < q < 1, got $q")
    val keyCols = keys.map(col)
    val hourly = df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols :+ date_trunc("hour", tsCol).as("bucket"): _*)
      .agg(avg(col(valueCol)).as("__v"))
    val lagged = hourly.select(
      keyCols :+ (col("bucket") + expr("INTERVAL 24 HOURS")).as("bucket") :+
        col("__v").as("__f"): _*)
    val wAll = Window.partitionBy(keyCols: _*)
    hourly
      .join(lagged, keys :+ "bucket")
      .withColumn("__r", col("__v") - col("__f"))
      .withColumn("__qr", expr(s"percentile(abs(__r), $q)").over(wAll))
      .withColumn("actual", roundStable(col("__v"), digits))
      .withColumn("forecast", roundStable(col("__f"), digits))
      .withColumn("resid", roundStable(col("__r"), digits))
      .withColumn("band_radius", roundStable(col("__qr"), digits))
      .withColumn("band_lo", roundStable(col("__f") - col("__qr"), digits))
      .withColumn("band_hi", roundStable(col("__f") + col("__qr"), digits))
      .withColumn("outside_band",
        (abs(col("resid")) > col("band_radius")).cast("long"))
      .select(keyCols ++ Seq(col("bucket"), col("actual"), col("forecast"),
        col("resid"), col("band_lo"), col("band_hi"),
        col("outside_band")): _*)
  }

  /** Augmented Dickey–Fuller test (lag-0 / constant-only form) per key
    * (Dickey & Fuller 1979) — IS this series mean-reverting or a
    * random walk: regress `Δy_t = α + β·y_{t−1}`, `t = β̂/se(β̂)`;
    * a unit root (random walk — variance grows without bound, every
    * mean-based monitor on it lies) cannot be rejected when t exceeds
    * the pinned 5% critical value −2.86 (constant-only, large n;
    * MacKinnon 1991). One keyed lag window, then pure moments — the
    * A30 regression discipline, nothing quadratic. Keys with n < 4 or
    * a degenerate lag variance emit NULL t with counts visible.
    */
  def adfTest(df: DataFrame, keys: Seq[String], orderCol: Column,
              tieCol: Column, valueCol: String,
              digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
    val staged = df.filter(col(valueCol).isNotNull)
      .withColumn("__y", col(valueCol).cast("double"))
      .withColumn("__yl", lag(col("__y"), 1).over(w))
      .filter(col("__yl").isNotNull)
      .withColumn("__dy", col("__y") - col("__yl"))
    val n = count(lit(1)).cast("double")
    val sxx = sum(col("__yl") * col("__yl")) -
      sum(col("__yl")) * sum(col("__yl")) / n
    val syy = sum(col("__dy") * col("__dy")) -
      sum(col("__dy")) * sum(col("__dy")) / n
    val sxy = sum(col("__yl") * col("__dy")) -
      sum(col("__yl")) * sum(col("__dy")) / n
    val beta = sxy / sxx
    val rss = syy - beta * sxy
    val se = sqrt((rss / (n - lit(2.0))) / sxx)
    val t = beta / se
    val ok = n > 3 && sxx > 0 && rss > 0
    staged.groupBy(keyCols: _*)
      .agg(
        n.cast("long").as("n"),
        roundStable(when(sxx > 0, beta), digits).as("beta"),
        roundStable(when(ok, t), digits).as("t_stat"),
        when(ok, (t > lit(-2.86)).cast("long")).as("is_unit_root"))
  }

  /** Granger-causality screen (one lag) per key — does YESTERDAY's x
    * improve today's y beyond what yesterday's y already explains:
    * F-test of `y_t ~ y_{t−1}` vs `y_t ~ y_{t−1} + x_{t−1}`, the
    * standard lead/lag attribution readout on a metric pair (it
    * detects PREDICTIVE precedence, not causation — the honest name
    * is "Granger-causes"). Both regressions come from the SAME
    * centered-moment pass: the restricted RSS in closed form, the
    * unrestricted via the 2×2 normal equations (the q234 two-regressor
    * discipline) — one keyed lag window, one aggregation, nothing
    * iterative. Keys with a singular design (collinear lags) or n ≤ 3
    * emit NULL F with both R²s visible where defined.
    */
  def granger(df: DataFrame, keys: Seq[String], orderCol: Column,
              yCol: Column, xCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCol)
    val staged = df
      .withColumn("__y", yCol.cast("double"))
      .withColumn("__x", xCol.cast("double"))
      .withColumn("__y1", lag(col("__y"), 1).over(w))
      .withColumn("__x1", lag(col("__x"), 1).over(w))
      .filter(col("__y").isNotNull && col("__y1").isNotNull &&
        col("__x1").isNotNull)
    val n = count(lit(1)).cast("double")
    def c2(a: Column, b: Column) = sum(a * b) - sum(a) * sum(b) / n
    val syy = c2(col("__y"), col("__y"))
    val s11 = c2(col("__y1"), col("__y1"))
    val s22 = c2(col("__x1"), col("__x1"))
    val s12 = c2(col("__y1"), col("__x1"))
    val sy1 = c2(col("__y"), col("__y1"))
    val sy2 = c2(col("__y"), col("__x1"))
    val rssR = syy - sy1 * sy1 / s11
    val det = s11 * s22 - s12 * s12
    val b = (sy1 * s22 - sy2 * s12) / det
    val c = (sy2 * s11 - sy1 * s12) / det
    val rssU = syy - b * sy1 - c * sy2
    val f = (rssR - rssU) / (rssU / (n - lit(3.0)))
    val ok = n > 3 && det > 0 && rssU > 0 && s11 > 0 && syy > 0
    staged.groupBy(keyCols: _*)
      .agg(
        n.cast("long").as("n"),
        roundStable(when(ok, b), digits).as("beta_ylag"),
        roundStable(when(ok, c), digits).as("gamma_xlag"),
        roundStable(when(s11 > 0 && syy > 0,
          lit(1.0) - (syy - sy1 * sy1 / s11) / syy), digits)
          .as("r2_restricted"),
        roundStable(when(ok, lit(1.0) - rssU / syy), digits)
          .as("r2_unrestricted"),
        roundStable(when(ok, f), digits).as("f_stat"))
  }

  /** Time-weighted average per key — the irregular-sampling correction a
    * plain `avg` gets wrong (a sensor that reports every second while
    * misbehaving and hourly while fine biases the plain mean toward the
    * misbehaving period): each reading holds until the key's NEXT
    * reading (step interpolation), so its weight is that holding
    * duration in seconds. The key's LAST reading has no holding interval
    * and contributes nothing (its `lead` is null — excluded from both
    * sums), matching the half-open convention of the interval operators.
    * `groupCols` may be coarser than `keys` (e.g. keys = sensor,
    * groupCols = sensor × day): the holding interval is computed within
    * the KEY series and the whole interval is attributed to the group
    * the reading STARTS in.
    *
    * One keyed window shuffle (lead rides the (orderCol, tieCol) sort);
    * the closing aggregation groups rows the window already partitioned.
    */
  def twap(df: DataFrame, keys: Seq[String], groupCols: Seq[Column],
           orderCol: Column, tieCol: Column, valueCol: String,
           decimals: Int = 6): DataFrame = {
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(orderCol, tieCol)
    val dt = (unix_micros(lead(orderCol, 1).over(wOrd)) -
      unix_micros(orderCol)).cast("double") / 1e6
    df.withColumn("__w", dt)
      .groupBy(groupCols: _*)
      .agg(
        roundStable(sum(col(valueCol) * col("__w")) / sum(col("__w")),
          decimals).as("twap"),
        roundStable(avg(col(valueCol)), decimals).as("plain_avg"),
        roundStable(sum(col("__w")), decimals).as("covered_secs"),
        count(lit(1)).as("n"))
  }

  /** Spearman rank correlation per key — the monotone-association
    * readout Pearson isn't (Spearman 1904): ρ = Pearson on the
    * fractional (average) ranks of each side, so ANY monotone relation
    * scores ±1 and a single outlier can't dominate the statistic.
    * Tie-exact: a tie group gets the mean of the ranks it spans
    * (`rank() + (peers − 1)/2`, the [[mannWhitneyU]] midrank
    * convention), which is what the textbook tie-corrected formula
    * reduces to when both sides run through the full product-moment
    * form — so no separate tie-correction term is needed.
    *
    * Shape: ONE keyed shuffle total. Both rank windows and the peer
    * counts partition by the same keys (two sort orders over one
    * Exchange); peers come from a RANGE frame [current, current] on the
    * value sort — the same Window node as the rank, no extra
    * partitioning on (key, value). The closing per-key moment agg
    * reuses the window's HashPartitioning. A side with zero variance
    * (all values tie) emits NULL (undefined, the rollingCorr guard
    * convention), never a 0/0.
    */
  def spearman(df: DataFrame, keys: Seq[String], xCol: Column, yCol: Column,
               decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val base = df.select(keyCols :+ xCol.as("__x") :+ yCol.as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def midrank(v: Column) = {
      val wOrd = Window.partitionBy(keyCols: _*).orderBy(v)
      val wPeers = wOrd.rangeBetween(Window.currentRow, Window.currentRow)
      rank().over(wOrd).cast("double") +
        (count(lit(1)).over(wPeers).cast("double") - 1) / 2
    }
    val ranked = base
      .withColumn("__rx", midrank(col("__x")))
      .withColumn("__ry", midrank(col("__y")))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("__rx"))
    val sy = sum(col("__ry"))
    val sxy = sum(col("__rx") * col("__ry"))
    val sxx = sum(col("__rx") * col("__rx"))
    val syy = sum(col("__ry") * col("__ry"))
    val den = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    ranked
      .groupBy(keyCols: _*)
      .agg(
        roundStable(when(den > 0, (n * sxy - sx * sy) / den), decimals)
          .as("spearman_rho"),
        count(lit(1)).as("n"))
  }

  /** Tail risk per key — VaR and expected shortfall at level `p`
    * (Artzner 1999; the latency-SLO twin: "p99, and the MEAN of what's
    * beyond it"): a p99 alone hides whether the worst 1% is 1.1× or
    * 100× the threshold — ES is the number that distinguishes a fat
    * tail from a near-miss. Exact ORDER-STATISTIC convention (no
    * interpolation to disagree on): the tail is the top
    * `k = ceil((1−p)·n)` rows of the (value, tie) sort; `var_p` = the
    * smallest tail value (the (n−k+1)-th order statistic), `es_p` =
    * the tail mean. One keyed window (descending row_number) + one
    * closing agg on the same partitioning. Keys with n < 1/(1−p) have
    * k = 1: VaR = ES = max — the degenerate case is well-defined, not
    * special-cased.
    */
  def tailStats(df: DataFrame, keys: Seq[String], valueCol: String,
                tieCol: Column, p: Double, digits: Int = 6): DataFrame = {
    require(p > 0 && p < 1, s"need 0 < p < 1, got $p")
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*)
      .orderBy(col(valueCol).desc, tieCol.desc)
    val wAll = Window.partitionBy(keyCols: _*)
    df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__k", ceil(col("__n") * (1.0 - p)).cast("long"))
      .filter(col("__rn") <= col("__k"))
      .groupBy(keyCols: _*)
      .agg(
        roundStable(min(col(valueCol)), digits).as("var_p"),
        roundStable(avg(col(valueCol)), digits).as("es_p"),
        max(col("__k")).as("n_tail"),
        max(col("__n")).as("n"))
  }

  /** Exponential time-decay aggregate per key — the recency-weighted
    * score every feature store keeps ("activity that counts, with a
    * half-life"): `Σ v_i · 2^(−(t_ref − t_i)/halflife)`, anchored at
    * the key's own latest event (`t_ref = max t`), so scores compare
    * keys by SHAPE of recent activity, not by when the data ends. A
    * closed-form single aggregation — no fold, no state; the decayed
    * sum, the equivalent-events count (same sum with v ≡ 1), and the
    * plain total for contrast. Exponent in exact micros ratio; both
    * engines evaluate the identical `exp(ln 2 · Δ)` tree.
    */
  def decayAgg(df: DataFrame, keys: Seq[String], tsCol: Column,
               valueCol: String, halfLifeSecs: Long,
               digits: Int = 6): DataFrame = {
    require(halfLifeSecs > 0, s"need halfLifeSecs > 0, got $halfLifeSecs")
    val keyCols = keys.map(col)
    val wAll = Window.partitionBy(keyCols: _*)
    val tUs = unix_micros(tsCol.cast("timestamp"))
    // ln 2 as a pinned literal, not Math.log/ln(2) — libm log is not
    // correctly rounded and engines may disagree in the last ulp
    val decay = exp(lit(0.6931471805599453) *
      ((tUs - max(tUs).over(wAll)).cast("double") /
        lit(halfLifeSecs * 1000000.0)))
    df.withColumn("__w", decay)
      .groupBy(keyCols: _*)
      .agg(
        roundStable(sum(col(valueCol) * col("__w")), digits)
          .as("decayed_sum"),
        roundStable(sum(col("__w")), digits).as("effective_n"),
        roundStable(sum(col(valueCol)), digits).as("plain_sum"),
        count(lit(1)).as("n"))
  }

  /** Period-over-period deltas — the WoW/MoM dashboard readout done
    * with EXACT calendar alignment: per (key, period) totals, each
    * joined to the key's PREVIOUS CALENDAR period (month arithmetic via
    * `add_months`, day/week via exact day intervals) — never a row
    * `lag`, which slides across gaps and silently compares March to
    * January when February is missing (the q95/q159 rule, applied to
    * reporting). A missing previous period emits NULL delta/pct —
    * visible, not fabricated; pct is NULL when the previous total is 0
    * (no base). One keyed agg + one self-join on the aggregated table
    * (O(#keys × #periods) rows).
    */
  def periodDelta(df: DataFrame, keys: Seq[String], tsCol: Column,
                  valueCol: String, unit: String,
                  digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val period = unit match {
      case "day" | "week" | "month" => to_date(date_trunc(unit, tsCol))
      case other => throw new IllegalArgumentException(
        s"unit must be day|week|month, got $other")
    }
    val totals = df
      .groupBy(keyCols :+ period.as("period"): _*)
      .agg(roundStable(sum(col(valueCol)), digits).as("value"))
    val prevPeriod = unit match {
      case "month" => add_months(col("period"), -1)
      case "week"  => date_add(col("period"), -7)
      case "day"   => date_add(col("period"), -1)
    }
    val prev = totals.select(keyCols :+ col("period").as("__pp") :+
      col("value").as("prev_value"): _*)
    totals
      .withColumn("__pp", prevPeriod)
      .join(prev, keys :+ "__pp", "left")
      .select(keyCols ++ Seq(col("period"), col("value"), col("prev_value"),
        roundStable(col("value") - col("prev_value"), digits).as("delta"),
        roundStable(when(col("prev_value") =!= 0,
          (col("value") - col("prev_value")) / col("prev_value") * 100),
          digits).as("pct_change")): _*)
  }

  /** Lagged cross-correlation between two hourly series — the "which
    * series LEADS which" readout ([[rollingCorr]] asks "do they move
    * together"; this asks "at what OFFSET"): for each lag L in `lags`,
    * the Pearson correlation of x(t) against y(t + L·hour) over all
    * hours where both exist. A peak at positive L means x leads y by L
    * hours (x's moves show up in y later) — the cheap causal screen
    * before anything heavier.
    *
    * Both series aggregate to per-hour means FIRST (state O(#hours),
    * corpus-size-free), the lag alignment is an EXACT-hour shifted
    * equi-join (the q95/q159 rule: a gap in the grid must drop the
    * pair, not slide the comparison), lags explode map-side from a
    * literal array, and each lag's correlation uses the explicit
    * shared-moment form (the [[rollingCorr]] ANSI + one-formula
    * lesson). Output per lag: `ccf`, `n_hours`; lags with < 2 aligned
    * hours or a zero-variance side emit NULL.
    */
  def crossCorr(df: DataFrame, tsCol: Column, isX: Column, isY: Column,
                valueCol: String, lags: Seq[Int],
                decimals: Int = 6): DataFrame = {
    require(lags.nonEmpty, "need at least one lag")
    def hourly(sel: Column, out: String) = df.filter(sel)
      .groupBy(date_trunc("hour", tsCol).as("__h"))
      .agg(avg(col(valueCol)).as(out))
    // alignment key in integer micros — interval arithmetic differs in
    // edge conventions across engines; int64 micros don't
    val hx = hourly(isX, "__x")
      .withColumn("lag", explode(array(lags.map(lit(_)): _*)))
      .withColumn("__ha",
        unix_micros(col("__h").cast("timestamp")) +
          col("lag").cast("long") * lit(3600000000L))
    val hy = hourly(isY, "__y")
      .select(unix_micros(col("__h").cast("timestamp")).as("__ha"),
        col("__y"))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("__x")); val sy = sum(col("__y"))
    val sxy = sum(col("__x") * col("__y"))
    val sxx = sum(col("__x") * col("__x"))
    val syy = sum(col("__y") * col("__y"))
    val den = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    hx.join(hy, Seq("__ha"))
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(roundStable(when(den > 0, (n * sxy - sx * sy) / den), decimals)
          .as("ccf"),
        count(lit(1)).as("n_hours"))
  }

  /** Weighted median per key — the 50% point of the WEIGHT mass, not
    * the row count: "the price at which half the QUANTITY traded", "the
    * latency below which half the TRAFFIC falls" — what plain median
    * silently gets wrong whenever rows carry unequal mass. Lower
    * weighted median convention: the smallest value whose cumulative
    * weight reaches half the total (exact, deterministic, and what both
    * engines replay identically — no interpolation convention to
    * disagree on). One keyed window (cumulative weight over the value
    * sort) + one closing agg on the same partitioning; nonpositive
    * weights are rejected up front (a zero-weight row cannot carry the
    * crossing). Scale: the window is per-key rows, no global sort; a
    * 100 TB key works iff its rows fit a partition's spill budget —
    * same contract as every keyed window here (A50's two-pass narrows
    * further if needed).
    */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: String,
                     weightCol: String, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val base = df.filter(col(valueCol).isNotNull && col(weightCol) > 0)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    base
      .withColumn("__cw", sum(col(weightCol)).over(wOrd))
      .withColumn("__tw", sum(col(weightCol)).over(wAll))
      .filter(col("__cw") >= col("__tw") / 2)
      .groupBy(keyCols: _*)
      .agg(roundStable(min(col(valueCol)), digits).as("w_median"),
        roundStable(max(col("__tw")), digits).as("total_weight"))
  }

  /** Weighted p-quantile per key — the general rung of [[weightedMedian]]
    * (same lower-quantile convention, chosen FOR cross-engine
    * exactness: the smallest value whose cumulative weight reaches
    * `p·W` is an actual data value, no interpolation convention to
    * disagree on): "the p90 price paid, PER UNIT SOLD" and every other
    * where-does-the-weighted-mass-sit question a row-quantile answers
    * wrongly. One keyed (value, tie) cumulative-weight window; rows
    * with NULL value or non-positive weight excluded by the same
    * [[weightedMedian]] contract.
    */
  def weightedQuantile(df: DataFrame, keys: Seq[String], valueCol: String,
                       weightCol: String, p: Double,
                       digits: Int = 6): DataFrame = {
    require(p > 0 && p < 1, s"need 0 < p < 1, got $p")
    val keyCols = keys.map(col)
    val base = df.filter(col(valueCol).isNotNull && col(weightCol) > 0)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    base
      .withColumn("__cw", sum(col(weightCol)).over(wOrd))
      .withColumn("__tw", sum(col(weightCol)).over(wAll))
      .filter(col("__cw") >= col("__tw") * lit(p))
      .groupBy(keyCols: _*)
      .agg(roundStable(min(col(valueCol)), digits).as("w_quantile"),
        roundStable(max(col("__tw")), digits).as("total_weight"))
  }

  /** Kaplan–Meier curve SUMMARY per key — the two numbers a survival
    * curve is quoted by, computed from [[kaplanMeier]]'s own output:
    * `median_survival_t` (the first time the curve crosses 0.5 — NULL
    * while more than half survive, which is an ANSWER: "median not
    * reached"), and the restricted mean survival time
    * `RMST = ∫₀^τ S(t) dt` to the observed horizon τ — the
    * model-free "average days healthy" effect size the hazard-ratio
    * literature recommends when proportional hazards is dubious
    * (Royston & Parmar 2013). The step-function integral is exact:
    * the pre-first-event segment at S = 1 plus each step's
    * `S(tᵢ)·(tᵢ₊₁ − tᵢ)` — one lead window over the O(#distinct
    * durations) curve rows. The 6dp-rounded survival values feed both
    * the 0.5 crossing and the integral, so every engine integrates
    * the identical staircase.
    */
  def kmSummary(df: DataFrame, keys: Seq[String], durationCol: String,
                observedCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val km = kaplanMeier(df, keys, durationCol, observedCol, digits)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("t"))
    val wAll = Window.partitionBy(keyCols: _*)
    km
      .withColumn("__next", lead(col("t"), 1).over(wOrd))
      .withColumn("__seg", col("survival") *
        (coalesce(col("__next"), col("t")) - col("t")).cast("double"))
      .withColumn("__t0", min(col("t")).over(wAll))
      .groupBy(keyCols: _*)
      .agg(
        min(when(col("survival") <= 0.5, col("t"))).as("median_survival_t"),
        roundStable(max(col("__t0")).cast("double") + sum(col("__seg")),
          digits).as("rmst"),
        max(col("t")).as("horizon_t"),
        roundStable(min(col("survival")), digits).as("final_survival"),
        max(col("n_risk")).as("n_subjects"))
  }

  /** Deterministic mode per key — the most frequent value with a TOTAL
    * tiebreak (count desc, value asc), because "the mode" of a tied
    * column is otherwise whichever partition answered last: the
    * categorical twin of the median, and the value-imputation default
    * for discrete columns. One (key, value) count aggregation + one
    * keyed rank window over the distinct values.
    */
  def modeValue(df: DataFrame, keys: Seq[String], valueCol: String,
                digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols :+ col(valueCol).as("mode"): _*)
      .agg(count(lit(1)).as("mode_count"))
    val wOrd = Window.partitionBy(keyCols: _*)
      .orderBy(col("mode_count").desc, col("mode"))
    val wAll = Window.partitionBy(keyCols: _*)
    counts
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__tot", sum(col("mode_count")).over(wAll))
      .withColumn("__nv", count(lit(1)).over(wAll))
      .filter(col("__rn") === 1)
      .select(keyCols ++ Seq(col("mode"), col("mode_count"),
        col("__nv").as("n_distinct"),
        roundStable(col("mode_count").cast("double") / col("__tot"),
          digits).as("mode_share")): _*)
  }

  /** Kendall tau-b per key between two bucket-aggregated series — the
    * concordance coefficient (Kendall 1938): of all bucket pairs, how
    * many order x and y the SAME way minus how many invert, normalized
    * by the tie-adjusted pair counts (tau-b). Next to [[spearman]] it
    * is the more robust/interpretable of the two rank measures (a
    * probability difference, less sensitive to a few large rank gaps)
    * at a quadratic-pairs price — which is why this form runs over the
    * AGGREGATED per-bucket series: pair count is bounded by the
    * CALENDAR (the [[theilSen]] bound), never by row count; 83 months
    * is 3.4k pairs however many trillion rows fed them.
    *
    * Ties need no separate correction pass: tau-b's denominators are
    * exactly `#pairs with x_a ≠ x_b` × `#pairs with y_a ≠ y_b`, counted
    * on the SAME pair join that counts concordance. Bucket means are
    * rounded before comparison (the [[graft.etl.Drift.pettitt]]
    * cross-engine tie-stability rule). One keyed agg + one keyed
    * self-join; all-tied sides emit NULL.
    */
  def kendallTau(df: DataFrame, keys: Seq[String], bucketCol: Column,
                 xCol: String, yCol: String, digits: Int = 6,
                 seriesDigits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val series = df
      .groupBy(keyCols :+ bucketCol.as("__b"): _*)
      .agg(roundStable(avg(col(xCol)), seriesDigits).as("__x"),
        roundStable(avg(col(yCol)), seriesDigits).as("__y"))
    val a = series.select(keyCols :+ col("__b").as("__ba") :+
      col("__x").as("__xa") :+ col("__y").as("__ya"): _*)
    val b = series.select(keyCols :+ col("__b").as("__bb") :+
      col("__x").as("__xb") :+ col("__y").as("__yb"): _*)
    val dxy = signum(col("__xb") - col("__xa")) *
      signum(col("__yb") - col("__ya"))
    val nc = sum(when(dxy > 0, 1L).otherwise(0L))
    val nd = sum(when(dxy < 0, 1L).otherwise(0L))
    val nxNe = sum(when(col("__xa") =!= col("__xb"), 1L).otherwise(0L))
    val nyNe = sum(when(col("__ya") =!= col("__yb"), 1L).otherwise(0L))
    a.join(b, keys).filter(col("__ba") < col("__bb"))
      .groupBy(keyCols: _*)
      .agg(
        roundStable(when(nxNe > 0 && nyNe > 0,
          (nc - nd).cast("double") /
            sqrt(nxNe.cast("double") * nyNe.cast("double"))), digits)
          .as("tau_b"),
        nc.as("n_concordant"), nd.as("n_discordant"),
        count(lit(1)).as("n_pairs"))
  }

  /** Mann–Kendall trend test per key (Mann 1945; Kendall's S against
    * time) — the SIGNIFICANCE half of the robust-trend pair:
    * [[theilSen]] says HOW FAST the series moves, MK says whether a
    * monotone trend is THERE at all, distribution-free (no residual
    * normality assumed, outlier-immune — each pair contributes ±1
    * regardless of magnitude). `S = Σ_{i<j} sign(x_j − x_i)` over the
    * per-`bucketCol` mean series, with the tie-corrected variance
    * `Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18` and the
    * continuity-corrected `z = (S ∓ 1)/√Var(S)` (|z| > 1.96 ≈ α 0.05).
    *
    * Shape — the [[kendallTau]] discipline: the corpus reduces FIRST
    * to the bucket series (pair count bounded by the CALENDAR, not the
    * data; 60 daily buckets = 1.8k pairs/key), then one pair self-join
    * feeds S while the tie term and n come from a per-key agg over the
    * SAME series; bucket means are ROUNDED before comparison so sign
    * ties resolve identically on every engine. Keys with < 2 buckets
    * emit NULL S (no pair to sign); an all-tied key has Var(S) = 0 and
    * emits NULL z ("no evidence either way" stays visible).
    */
  def mannKendall(df: DataFrame, keys: Seq[String], bucketCol: Column,
                  valueCol: String, digits: Int = 6,
                  seriesDigits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val series = df
      .groupBy(keyCols :+ bucketCol.as("__b"): _*)
      .agg(roundStable(avg(col(valueCol)), seriesDigits).as("__v"))
    val a = series.select(keyCols :+ col("__b").as("__ba") :+
      col("__v").as("__va"): _*)
    val b = series.select(keyCols :+ col("__b").as("__bb") :+
      col("__v").as("__vb"): _*)
    val sAgg = a.join(b, keys).filter(col("__ba") < col("__bb"))
      .groupBy(keyCols: _*)
      .agg(sum(signum(col("__vb") - col("__va"))).cast("long").as("__s"),
        count(lit(1)).as("__npairs"))
    val t = count(lit(1)).cast("double")
    val tieAgg = series
      .groupBy(keyCols :+ col("__v"): _*)
      .agg(t.as("__t"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__t") * (col("__t") - 1) * (lit(2) * col("__t") + 5))
          .as("__tieterm"),
        sum(col("__t")).cast("double").as("__n"))
    val n = col("__n")
    val varS = (n * (n - 1) * (lit(2) * n + 5) - col("__tieterm")) / lit(18.0)
    val s = col("__s").cast("double")
    val z = when(varS > 0,
      when(s > 0, (s - 1) / sqrt(varS))
        .when(s < 0, (s + 1) / sqrt(varS))
        .otherwise(lit(0.0)))
    tieAgg.join(sAgg, keys, "left")
      .select(keyCols ++ Seq(
        col("__s").as("s_stat"),
        col("__n").cast("long").as("n_buckets"),
        coalesce(col("__npairs"), lit(0L)).as("n_pairs"),
        roundStable(when(col("__s").isNotNull, varS), digits).as("var_s"),
        roundStable(when(col("__s").isNotNull, z), digits).as("z")): _*)
  }

  /** Maximum drawdown per key — the worst peak-to-trough drop a series
    * ever suffered (the risk number SLO burn-down, revenue, and any
    * cumulative-health series is judged by): `max_t (peak_t − x_t)`
    * with `peak_t = max_{s≤t} x_s`, plus the peak-relative fraction
    * and WHEN the trough landed. A plain `max(x) − min(x)` overstates
    * it whenever the min precedes the max — drawdown is order-aware,
    * which is exactly why it needs the cumulative window.
    *
    * Shape: one keyed cumulative-max window (time order), then a
    * second window on the SAME key partitioning ranks (drawdown desc,
    * time asc) so the reported trough is the EARLIEST worst point —
    * deterministic under ties by construction, no argmax ambiguity.
    * Two sorts, one shuffle. `max_dd_frac` is NULL when the peak at
    * the trough is ≤ 0 (no positive base to be relative to).
    */
  def maxDrawdown(df: DataFrame, keys: Seq[String], valueCol: String,
                  orderCol: Column, tieCol: Column,
                  digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val wCum = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = df
      .withColumn("__peak", max(col(valueCol)).over(wCum))
      .withColumn("__dd", col("__peak") - col(valueCol))
    val wPick = Window.partitionBy(keyCols: _*)
      .orderBy(col("__dd").desc, orderCol, tieCol)
    staged
      .withColumn("__rn", row_number().over(wPick))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCols: _*)))
      .filter(col("__rn") === 1)
      .select(keyCols ++ Seq(
        roundStable(col("__dd"), digits).as("max_dd"),
        roundStable(when(col("__peak") > 0, col("__dd") / col("__peak")),
          digits).as("max_dd_frac"),
        roundStable(col("__peak"), digits).as("peak_value"),
        orderCol.as("trough_at"),
        col("__n").as("n")): _*)
  }

  /** Wald–Wolfowitz runs test per key — "are the fluctuations around
    * the median RANDOM, or does the series stick?" The residual-
    * independence check run after a trend fit (A30/A46) or before
    * trusting an i.i.d. assumption anywhere: too FEW runs = positive
    * autocorrelation (the series lingers on one side — the common
    * sensor-drift shape), too MANY = oscillation. R = number of
    * maximal same-side runs against the key's own exact median;
    * `z = (R − μ)/σ` with `μ = 1 + 2·n₊n₋/n`,
    * `σ² = 2n₊n₋(2n₊n₋ − n) / (n²(n−1))`.
    *
    * Values equal to the median are EXCLUDED (the textbook convention
    * — they belong to neither side); the interpolated exact median is
    * the same `percentile` both engines compute, so the exclusion set
    * is identical cross-engine. One broadcast of per-key medians, one
    * keyed lag window; a key with an empty side (n₊ or n₋ = 0) has
    * σ = 0 and emits NULL z with both counts visible.
    */
  def runsTest(df: DataFrame, keys: Seq[String], valueCol: String,
               orderCol: Column, tieCol: Column,
               digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val med = df.groupBy(keyCols: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
    val staged = df.join(broadcast(med), keys)
      .filter(col(valueCol) =!= col("__med"))
      .withColumn("__s", (col(valueCol) > col("__med")).cast("int"))
      .withColumn("__new",
        when(lag(col("__s"), 1).over(wOrd).isNull ||
          lag(col("__s"), 1).over(wOrd) =!= col("__s"), 1L).otherwise(0L))
    val np = sum(col("__s")).cast("double")
    val nn = (count(lit(1)) - sum(col("__s"))).cast("double")
    val n = count(lit(1)).cast("double")
    val mu = lit(1.0) + lit(2.0) * np * nn / n
    val v = lit(2.0) * np * nn * (lit(2.0) * np * nn - n) /
      (n * n * (n - 1))
    staged
      .groupBy(keyCols: _*)
      .agg(
        np.cast("long").as("n_pos"),
        nn.cast("long").as("n_neg"),
        sum(col("__new")).as("n_runs"),
        roundStable(when(n > 1, mu), digits).as("expected_runs"),
        roundStable(when(n > 1 && v > 0,
          (sum(col("__new")).cast("double") - mu) / sqrt(v)), digits)
          .as("z"))
  }

  /** Hodges–Lehmann location estimator per key (Hodges & Lehmann
    * 1963): the median of all Walsh averages `(x_i + x_j)/2, i ≤ j` —
    * the robust center the Wilcoxon test inverts to, sitting BETWEEN
    * the mean (efficient, fragile) and the median (robust, throws
    * away data): ~96% Gaussian efficiency at a 29% breakdown point.
    * The readout to publish when the mean and median of a skewed
    * series disagree and both camps have a point.
    *
    * Shape — the [[theilSen]]/[[kendallTau]] discipline: the corpus
    * reduces FIRST to per-`bucketCol` means (pair count bounded by
    * the CALENDAR: 30 daily buckets = 465 Walsh pairs/key, data-size-
    * independent), means ROUNDED before pairing so both engines pair
    * identical doubles; one pair self-join (i ≤ j — singletons ARE
    * Walsh pairs), exact interpolated median of the averages. The
    * plain series median rides along for the skew contrast.
    */
  def hodgesLehmann(df: DataFrame, keys: Seq[String], bucketCol: Column,
                    valueCol: String, digits: Int = 6,
                    seriesDigits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val series = df
      .groupBy(keyCols :+ bucketCol.as("__b"): _*)
      .agg(roundStable(avg(col(valueCol)), seriesDigits).as("__v"))
    val a = series.select(keyCols :+ col("__b").as("__ba") :+
      col("__v").as("__va"): _*)
    val b = series.select(keyCols :+ col("__b").as("__bb") :+
      col("__v").as("__vb"): _*)
    val pairs = a.join(b, keys).filter(col("__ba") <= col("__bb"))
      .withColumn("__w", (col("__va") + col("__vb")) / 2)
      .groupBy(keyCols: _*)
      .agg(expr("percentile(__w, 0.5)").as("__hl"),
        count(lit(1)).as("n_pairs"))
    val plain = series.groupBy(keyCols: _*)
      .agg(expr("percentile(__v, 0.5)").as("__med"),
        count(lit(1)).as("n_buckets"))
    plain.join(pairs, keys)
      .select(keyCols ++ Seq(
        roundStable(col("__hl"), digits).as("hl_location"),
        roundStable(col("__med"), digits).as("series_median"),
        col("n_buckets"), col("n_pairs")): _*)
  }

  /** Gini concentration coefficient per key over a nonnegative value —
    * the inequality readout for corpus/traffic balance (is one user /
    * domain / shard absorbing the volume?): 0 = uniform, → 1 = one row
    * holds everything. Computed from the rank identity
    * `G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n` over the (value, tieCol)-
    * ascending sort — one keyed window shuffle, the closing agg reuses
    * its partitioning. Exact for any tie pattern as long as the
    * tiebreak is deterministic (ties share a value, so their rank order
    * does not change the sum). Keys with Σx = 0 emit NULL (no mass to
    * concentrate).
    */
  def gini(df: DataFrame, keys: Seq[String], valueCol: String,
           tieCol: Column, decimals: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val wOrd = Window.partitionBy(keyCols: _*)
      .orderBy(col(valueCol), tieCol)
    val ranked = df.withColumn("__i", row_number().over(wOrd).cast("double"))
    ranked
      .groupBy(keyCols: _*)
      .agg(
        roundStable(
          when(sum(col(valueCol)) > 0,
            lit(2.0) * sum(col("__i") * col(valueCol)) /
              (count(lit(1)).cast("double") * sum(col(valueCol))) -
              (count(lit(1)) + lit(1)).cast("double") / count(lit(1))),
          decimals).as("gini"),
        count(lit(1)).as("n"),
        roundStable(sum(col(valueCol)), decimals).as("total"))
  }

  /** One-way ANOVA F-test per key — does the metric's MEAN differ
    * across the levels of a factor (the k-group generalization of
    * [[welchTTest]]'s two arms): `F = (SSB/(k−1)) / (SSW/(N−k))` from
    * the between/within sum-of-squares decomposition, plus `η² =
    * SSB/SST` — the share of variance the factor explains, the effect
    * size that keeps a huge-N significant-but-tiny F honest. Two
    * aggregations, both from moments (n, Σy, Σy² per cell — the
    * [[olsTrend]] discipline): the first reduces raw rows to one row
    * per (key, level), the second folds those O(#keys × #levels) rows
    * — no window, no sort, nothing quadratic. Degenerate keys (k < 2
    * levels, N ≤ k, or zero within-variance) emit NULL F with the
    * counts visible.
    */
  def anovaF(df: DataFrame, keys: Seq[String], factorCol: Column,
             yCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df.filter(yCol.isNotNull)
      .groupBy(keyCols :+ factorCol.as("__lvl"): _*)
      .agg(count(yCol).as("__n"), sum(yCol.cast("double")).as("__s"),
        sum(yCol.cast("double") * yCol.cast("double")).as("__ss"))
    val n   = sum(col("__n")).cast("double")
    val k   = count(lit(1)).cast("double")
    val s   = sum(col("__s"))
    val ss  = sum(col("__ss"))
    val ssb = sum(col("__s") * col("__s") / col("__n")) - s * s / n
    val sst = ss - s * s / n
    val ssw = ss - sum(col("__s") * col("__s") / col("__n"))
    val ok  = k > 1 && n > k && ssw > 0
    cells.groupBy(keyCols: _*)
      .agg(
        k.cast("long").as("k_groups"), n.cast("long").as("n"),
        (k - lit(1)).cast("long").as("df_between"),
        (n - k).cast("long").as("df_within"),
        roundStable(when(ok, (ssb / (k - lit(1))) / (ssw / (n - k))),
          digits).as("f_stat"),
        roundStable(when(sst > 0, ssb / sst), digits).as("eta_sq"))
  }

  /** McNemar test per key — did the HIT RATE change between two phases
    * over the SAME subjects (before/after a release, first/second half
    * of a window): the paired-binary test whose whole point is that
    * only the DISCORDANT pairs carry information — a subject that hits
    * (or misses) in both phases says nothing about change, and a
    * two-proportion z over the pooled rows ([[propTest]]) wrongly
    * counts it. `χ² = (b−c)²/(b+c)` over b = hit→miss, c = miss→hit,
    * plus the continuity-corrected `(|b−c|−1)²/(b+c)` (Edwards 1948).
    * Subjects present in only one phase have no pair and are excluded
    * (visible via `n_subjects` vs `n_pairs`). Two aggregations: raw
    * rows reduce to one row per (key, subject) first; b+c = 0 (no
    * discordance) emits NULL χ² with all four cells visible.
    */
  def mcnemar(df: DataFrame, keys: Seq[String], subjectCol: Column,
              inFirst: Column, isHit: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val perSubj = df.groupBy(keyCols :+ subjectCol.as("__subj"): _*)
      .agg(
        max(when(inFirst, 1L).otherwise(0L)).as("__pf"),
        max(when(!inFirst, 1L).otherwise(0L)).as("__ps"),
        max(when(inFirst && isHit, 1L).otherwise(0L)).as("__a"),
        max(when(!inFirst && isHit, 1L).otherwise(0L)).as("__b"))
    val paired = col("__pf") === 1L && col("__ps") === 1L
    val b = sum(when(paired && col("__a") === 1L && col("__b") === 0L, 1L)
      .otherwise(0L)).cast("double")
    val c = sum(when(paired && col("__a") === 0L && col("__b") === 1L, 1L)
      .otherwise(0L)).cast("double")
    val disc = b + c
    perSubj.groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_subjects"),
        sum(when(paired, 1L).otherwise(0L)).as("n_pairs"),
        sum(when(paired && col("__a") === 1L && col("__b") === 1L, 1L)
          .otherwise(0L)).as("both_hit"),
        sum(when(paired && col("__a") === 0L && col("__b") === 0L, 1L)
          .otherwise(0L)).as("neither_hit"),
        b.cast("long").as("first_only"),
        c.cast("long").as("second_only"),
        roundStable(when(disc > 0, (b - c) * (b - c) / disc), digits)
          .as("chi2"),
        roundStable(when(disc > 0,
          pow(abs(b - c) - lit(1.0), 2) / disc), digits).as("chi2_cc"))
  }

  /** CUPED variance reduction per key (Deng, Xu, Kohavi & Walker,
    * WSDM 2013) — the standard industrial trick for making an A/B
    * test read faster: adjust each unit's metric by its PRE-experiment
    * covariate, `Y_adj = Y − θ(X − E[X])` with `θ = cov(X,Y)/var(X)`,
    * which shrinks metric variance by exactly ρ²(X,Y) without biasing
    * the treatment difference (assignment is independent of X).
    * Input: ONE ROW PER UNIT with its metric `yCol`, covariate `xCol`,
    * and arm. Output: raw vs adjusted difference, θ, and the realized
    * variance-reduction share ρ². Everything derives from conditional
    * moments in ONE aggregation — θ's global moments and each arm's
    * means ride the same pass, no second scan, no join. Keys with
    * var(X) = 0 (constant covariate — nothing to regress out) emit
    * NULL θ/adjusted with the raw numbers visible.
    */
  def cuped(df: DataFrame, keys: Seq[String], isA: Column, yCol: Column,
            xCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val base = df.filter(yCol.isNotNull && xCol.isNotNull)
    val x = xCol.cast("double")
    val y = yCol.cast("double")
    val theta = covar_samp(x, y) / var_samp(x)
    val rawDiff = avg(when(isA, y)) - avg(when(!isA, y))
    val adjDiff = rawDiff -
      theta * (avg(when(isA, x)) - avg(when(!isA, x)))
    val ok = var_samp(x) > 0 && var_samp(y) > 0 &&
      count(when(isA, y)) > 0 && count(when(!isA, y)) > 0
    // rho^2 from cov^2/(vx*vy) as a GUARDED projection — Spark's corr
    // aggregate ANSI-throws DIVIDE_BY_ZERO on a zero-variance key
    // before any CaseWhen can skip it (the q222 Heaps'-law lesson)
    val rho2 = (covar_samp(x, y) * covar_samp(x, y)) /
      (var_samp(x) * var_samp(y))
    base.groupBy(keyCols: _*)
      .agg(
        count(when(isA, y)).as("n_a"),
        count(when(!isA, y)).as("n_b"),
        roundStable(when(var_samp(x) > 0, theta), digits).as("theta"),
        roundStable(rawDiff, digits).as("diff_raw"),
        roundStable(when(ok, adjDiff), digits).as("diff_adj"),
        roundStable(when(ok, rho2), digits).as("var_reduction"))
  }

  /** Power / minimum-detectable-effect readout per key — the question
    * to ask BEFORE an A/B test ships ("can this traffic even see the
    * effect we care about?") and the autopsy after a flat one ("was it
    * powered to?"): at α = 0.05 two-sided and 80% power,
    * `MDE = (z_{0.975} + z_{0.8}) · √(σ²(1/n_a + 1/n_b))` over the
    * observed arm sizes and pooled sample variance, plus the per-arm n
    * REQUIRED to detect a `targetRel` relative move of the current
    * mean. The z-sum 2.801586 is pinned as a literal (the cross-engine
    * transcendental discipline); `n_needed` applies ceil AFTER the
    * 6dp rounding so both engines step at the same boundary. One
    * aggregation from moments. Zero-variance or single-arm keys emit
    * NULL effects with counts visible.
    */
  def powerMde(df: DataFrame, keys: Seq[String], isA: Column, yCol: Column,
               targetRel: Double = 0.05, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val y = yCol.cast("double")
    val zSum = lit(2.801586) // z_{0.975} + z_{0.8} = 1.959964 + 0.841621
    val na = count(when(isA, y)).cast("double")
    val nb = count(when(!isA, y)).cast("double")
    val s2 = var_samp(y)
    val m = avg(y)
    val mde = zSum * sqrt(s2 * (lit(1.0) / na + lit(1.0) / nb))
    val delta = abs(m) * lit(targetRel)
    val ok = na > 1 && nb > 1 && s2 > 0
    df.filter(y.isNotNull).groupBy(keyCols: _*)
      .agg(
        na.cast("long").as("n_a"), nb.cast("long").as("n_b"),
        roundStable(m, digits).as("mean"),
        roundStable(sqrt(s2), digits).as("sd"),
        roundStable(when(ok, mde), digits).as("mde_abs"),
        roundStable(when(ok && abs(m) > 0, mde / abs(m)), digits)
          .as("mde_rel"),
        when(ok && delta > 0, ceil(roundStable(
          lit(2.0) * s2 * zSum * zSum / (delta * delta), digits))
          .cast("long")).as("n_per_arm_needed"))
  }

  /** Delta-method CI for a RATIO-of-sums metric per key (Deng et al.,
    * "Applying the Delta Method in Metric Analytics", KDD 2018) —
    * revenue per session, clicks per user, value per event: the
    * metric is `R = ΣY/ΣX` over units, and treating it as a plain
    * mean understates its variance because each unit contributes to
    * numerator AND denominator. `var(R) ≈ (σ²_y − 2R·σ_xy + R²σ²_x) /
    * (n · x̄²)`, the first-order Taylor expansion around (x̄, ȳ).
    * Input: ONE ROW PER UNIT with its numerator and denominator
    * totals. One aggregation from moments; keys with Σx ≤ 0 or n < 2
    * emit NULL CI with the ratio's components visible.
    */
  def ratioMetricCi(df: DataFrame, keys: Seq[String], numCol: Column,
                    denCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val y = numCol.cast("double")
    val x = denCol.cast("double")
    val n = count(lit(1)).cast("double")
    val r = sum(y) / sum(x)
    // the quadratic form is var(y − Rx) ≥ 0 mathematically; clamp the
    // floating-point subtraction so an epsilon-negative can't NaN the CI
    // (the oracle applies the identical greatest(…, 0))
    val se = sqrt(greatest(var_samp(y) - lit(2.0) * r * covar_samp(x, y) +
      r * r * var_samp(x), lit(0.0)) / n) / avg(x)
    val ok = sum(x) > 0 && n > 1 && avg(x) > 0
    df.filter(y.isNotNull && x.isNotNull).groupBy(keyCols: _*)
      .agg(
        n.cast("long").as("n_units"),
        roundStable(sum(y), digits).as("num_total"),
        roundStable(sum(x), digits).as("den_total"),
        roundStable(when(sum(x) > 0, r), digits).as("ratio"),
        roundStable(when(ok, se), digits).as("se"),
        roundStable(when(ok, r - lit(1.96) * se), digits).as("ci_lo"),
        roundStable(when(ok, r + lit(1.96) * se), digits).as("ci_hi"))
  }

  /** Empirical-Bayes rate shrinkage (beta-binomial, method-of-moments
    * prior — the Robinson "batting average" estimator) — rank items
    * by success RATE without letting a 1/1 item beat a 4981/5000 one:
    * fit a Beta(α, β) prior to the observed per-item rates by moments
    * (`α+β = m(1−m)/v − 1`), then shrink each item toward it:
    * `(α + x)/(α + β + n)` — items with little data move most, items
    * with lots barely move, and the ranking becomes defensible. One
    * item aggregation + prior moments via a window over the O(#items)
    * rows (the prior must see ALL items — that is the "empirical").
    * Degenerate priors (zero between-item variance, or MoM outside
    * the Beta family) emit NULL shrunk rates with the raw ones
    * visible.
    */
  def ebShrinkRates(df: DataFrame, itemCols: Seq[String], isSuccess: Column,
                    digits: Int = 6): DataFrame = {
    require(itemCols.nonEmpty, "need at least one item column")
    val items = df.groupBy(itemCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(isSuccess, 1L).otherwise(0L)).as("x"))
      .withColumn("__r", col("x").cast("double") / col("n").cast("double"))
    val wAll = Window.partitionBy(lit(1))
    val staged = items
      .withColumn("__m", avg(col("__r")).over(wAll))
      .withColumn("__v", var_samp(col("__r")).over(wAll))
    val ab = col("__m") * (lit(1.0) - col("__m")) / col("__v") - lit(1.0)
    val ok = col("__v") > 0 && ab > 0
    staged
      .withColumn("__ab", when(ok, ab))
      .select(itemCols.map(col) ++ Seq(col("n"), col("x"),
        roundStable(col("__r"), digits).as("raw_rate"),
        roundStable(col("__m") * col("__ab"), digits).as("alpha"),
        roundStable((lit(1.0) - col("__m")) * col("__ab"), digits)
          .as("beta"),
        roundStable((col("__m") * col("__ab") + col("x").cast("double")) /
          (col("__ab") + col("n").cast("double")), digits)
          .as("shrunk_rate")): _*)
  }

  /** Simpson's-paradox detector per key — does the POOLED A-vs-B
    * difference point the opposite way from the STRATIFIED one: the
    * pooled diff vs the segment-size-weighted (direct-standardized)
    * within-segment diff, signs compared on 6dp-ROUNDED values. A
    * reversal means the segment MIX, not the treatment, is driving
    * the pooled readout (A84 decomposes the gap; this flags when the
    * gap's very sign is a mix artifact — the classic kidney-stone /
    * admissions trap). Two aggregations: segments reduce first,
    * per-key pooled moments ride the same pass via conditional sums;
    * segments missing an arm are excluded from the standardized diff
    * and counted visibly.
    */
  def simpsonCheck(df: DataFrame, keys: Seq[String], segCol: Column,
                   isA: Column, yCol: Column,
                   digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val y = yCol.cast("double")
    val cells = df.filter(y.isNotNull)
      .groupBy(keyCols :+ segCol.as("__seg"): _*)
      .agg(count(when(isA, y)).as("__na"),
        count(when(!isA, y)).as("__nb"),
        avg(when(isA, y)).as("__ma"),
        avg(when(!isA, y)).as("__mb"),
        sum(when(isA, y)).as("__sa"),
        sum(when(!isA, y)).as("__sb"))
    val both = col("__na") > 0 && col("__nb") > 0
    val nSeg = col("__na") + col("__nb")
    val pooled = sum(col("__sa")) / sum(col("__na")) -
      sum(col("__sb")) / sum(col("__nb"))
    val stdDiff = sum(when(both, nSeg.cast("double") *
        (col("__ma") - col("__mb")))) /
      sum(when(both, nSeg.cast("double")))
    val pooledR = roundStable(pooled, digits)
    val stdR = roundStable(stdDiff, digits)
    cells.groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(both, 1L).otherwise(0L)).as("n_segments_used"),
        pooledR.as("pooled_diff"),
        stdR.as("standardized_diff"),
        when(pooledR.isNotNull && stdR.isNotNull,
          (signum(pooledR) =!= signum(stdR) &&
            signum(pooledR) =!= 0 && signum(stdR) =!= 0).cast("long"))
          .as("reversal"))
  }

  /** Record-breaking counts per key (Glick 1978, records theory) —
    * the nonparametric trend screen: in an i.i.d. (trend-free) series
    * the expected number of running-maximum breaks is the harmonic
    * number `H_n ≈ ln n` regardless of distribution; observed record
    * counts far above H_n mean upward trend, record-LOW counts above
    * it mean decay — no model, no parameters, just counting. Both
    * directions reported with their observed/expected ratios (rounded
    * before the caller compares). First point counts as a record in
    * both directions (the convention that makes H_n exact). One keyed
    * window pass (running extrema over the preceding frame) + one
    * agg; the harmonic sum rides the same rank column.
    */
  def recordCounts(df: DataFrame, keys: Seq[String], orderCol: Column,
                   tieCol: Column, valueCol: String,
                   digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCol, tieCol)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val v = col(valueCol).cast("double")
    val staged = df.filter(col(valueCol).isNotNull)
      .withColumn("__j", row_number().over(w))
      .withColumn("__pmax", max(v).over(wPrev))
      .withColumn("__pmin", min(v).over(wPrev))
      .withColumn("__up",
        (col("__pmax").isNull || v > col("__pmax")).cast("long"))
      .withColumn("__dn",
        (col("__pmin").isNull || v < col("__pmin")).cast("long"))
    val h = sum(lit(1.0) / col("__j").cast("double"))
    staged.groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__up")).as("records_up"),
        sum(col("__dn")).as("records_down"),
        roundStable(h, digits).as("expected_records"),
        roundStable(sum(col("__up")).cast("double") / h, digits)
          .as("up_ratio"),
        roundStable(sum(col("__dn")).cast("double") / h, digits)
          .as("down_ratio"))
  }

  /** Post-stratified mean (survey-weighting classic) — re-weight a
    * possibly-skewed SAMPLE to a reference population's stratum mix:
    * `x̂ = Σ (N_h/N)·x̄_h` with `SE = √(Σ (N_h/N)²·s²_h/n_h)` — the
    * mix-adjusted read when the collection process over/under-samples
    * strata (the estimation-side complement of [[neymanAllocation]]'s
    * design side; A84's rate/mix decomposition EXPLAINS a gap, this
    * CORRECTS one). One conditional aggregation builds reference
    * counts and sample moments per stratum from the same pass — no
    * join; the closing fold rides O(#strata) rows. A reference
    * stratum absent from the sample makes the estimator undefined —
    * reported as NULL with `n_missing_strata` visible, never silently
    * renormalized; sample-only strata carry weight 0 and are counted
    * in `n_new_strata`.
    */
  def postStratified(df: DataFrame, strataCols: Seq[String],
                     valueCol: Column, isRef: Column,
                     digits: Int = 6): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    val y = valueCol.cast("double")
    val cells = df.groupBy(strataCols.map(col): _*)
      .agg(
        sum(when(isRef, 1L).otherwise(0L)).as("__refn"),
        count(when(!isRef, y)).as("__nh"),
        avg(when(!isRef, y)).as("__mh"),
        var_samp(when(!isRef, y)).as("__vh"))
    val nh = col("__nh").cast("double")
    // population total via a window over the O(#strata) cell rows — a
    // nested aggregate (Σ inside the weighted Σ) is not expressible in
    // one agg
    val wAll = Window.partitionBy(lit(1))
    val staged = cells.withColumn("__bigN",
      sum(when(col("__refn") > 0, col("__refn"))).over(wAll).cast("double"))
    val wgt = col("__refn").cast("double") / col("__bigN")
    val missing = sum(when(col("__refn") > 0 && col("__nh") === 0L, 1L)
      .otherwise(0L))
    val thin = sum(when(col("__refn") > 0 && col("__nh") > 0 &&
      col("__nh") < 2L, 1L).otherwise(0L))
    val ok = missing === 0
    staged.agg(
      sum(when(col("__refn") > 0, 1L).otherwise(0L)).as("n_strata"),
      missing.as("n_missing_strata"),
      sum(when(col("__refn") === 0L && col("__nh") > 0, 1L).otherwise(0L))
        .as("n_new_strata"),
      roundStable(sum(when(col("__nh") > 0, nh * col("__mh"))) /
        sum(when(col("__nh") > 0, nh)), digits).as("raw_mean"),
      roundStable(when(ok,
        sum(when(col("__refn") > 0 && col("__nh") > 0,
          wgt * col("__mh")))), digits).as("ps_mean"),
      roundStable(when(ok && thin === 0,
        sqrt(sum(when(col("__refn") > 0 && col("__nh") > 1,
          wgt * wgt * col("__vh") / nh)))), digits).as("se"))
  }

  /** Difference-in-differences estimator per key (Card & Krueger
    * lineage) — the before/after comparison done right when treatment
    * wasn't randomized: `DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post −
    * ȳ_C,pre)` nets out both the groups' standing difference and the
    * common time trend, the two things a naive before/after and a
    * naive treat/control each confound. SE from the four cell
    * variances (independent-cells normal approximation) with a 95%
    * CI. ONE conditional-moments aggregation — four cells, no join,
    * no second scan; any cell with < 2 rows emits NULL effect with
    * all four cell means visible (the parallel-trends caveat is the
    * caller's to argue — this reports the arithmetic honestly).
    */
  def diffInDiff(df: DataFrame, keys: Seq[String], isTreat: Column,
                 isPost: Column, yCol: Column,
                 digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val y = yCol.cast("double")
    def cell(t: Boolean, p: Boolean) = {
      val c = (if (t) isTreat else !isTreat) && (if (p) isPost else !isPost)
      (avg(when(c, y)), var_samp(when(c, y)), count(when(c, y)))
    }
    val (mtp, vtp, ntp) = cell(t = true, p = true)
    val (mtq, vtq, ntq) = cell(t = true, p = false)
    val (mcp, vcp, ncp) = cell(t = false, p = true)
    val (mcq, vcq, ncq) = cell(t = false, p = false)
    val did = (mtp - mtq) - (mcp - mcq)
    val se = sqrt(vtp / ntp + vtq / ntq + vcp / ncp + vcq / ncq)
    val ok = ntp > 1 && ntq > 1 && ncp > 1 && ncq > 1
    df.groupBy(keyCols: _*)
      .agg(
        ntp.as("n_treat_post"), ntq.as("n_treat_pre"),
        ncp.as("n_ctrl_post"), ncq.as("n_ctrl_pre"),
        roundStable(mtp, digits).as("m_treat_post"),
        roundStable(mtq, digits).as("m_treat_pre"),
        roundStable(mcp, digits).as("m_ctrl_post"),
        roundStable(mcq, digits).as("m_ctrl_pre"),
        roundStable(when(ok, did), digits).as("did"),
        roundStable(when(ok, se), digits).as("se"),
        roundStable(when(ok, did - lit(1.96) * se), digits).as("ci_lo"),
        roundStable(when(ok, did + lit(1.96) * se), digits).as("ci_hi"))
  }

  /** Cohort retention half-life per cohort — the DECAY-RATE summary
    * of the A14/q49 retention triangle: fit `ln(retention) = α + β·
    * week` by OLS over the observed offsets (log-linear = the
    * exponential-decay model every retention curve is eyeballed
    * against) and report `half_life = −ln2/β` — "this cohort loses
    * half its actives every H weeks", the one number cohorts are
    * compared by, plus r² so a badly non-exponential cohort is
    * visible instead of silently mis-summarized. Same single-pass
    * staging as q49 (one shuffle per user, one per cohort-offset);
    * the fit is the A30 moments discipline over O(#cohorts × #weeks)
    * rows; ln 2 pinned. Growing or flat cohorts (β ≥ 0) emit NULL
    * half-life with the slope visible.
    */
  def retentionHalfLife(df: DataFrame, tsCol: Column, entityCol: Column,
                        digits: Int = 6): DataFrame = {
    val counts = df.groupBy(entityCol.as("__u"))
      .agg(date_trunc("week", min(tsCol)).as("cohort"),
        collect_set(date_trunc("week", tsCol)).as("__wks"))
      .select(col("cohort"), explode(col("__wks")).as("__wk"))
      .groupBy(col("cohort"),
        floor(datediff(to_date(col("__wk")), to_date(col("cohort"))) / 7)
          .cast("long").as("__off"))
      .agg(count(lit(1)).as("__active"))
    val wC = Window.partitionBy(col("cohort"))
    val pts = counts
      .withColumn("__base",
        max(when(col("__off") === 0L, col("__active"))).over(wC))
      .filter(col("__off") >= 1L && col("__base") > 0 &&
        col("__active") > 0)
      .withColumn("__y", log(col("__active").cast("double") /
        col("__base").cast("double")))
      .withColumn("__t", col("__off").cast("double"))
    val n = count(lit(1)).cast("double")
    val sxx = sum(col("__t") * col("__t")) -
      sum(col("__t")) * sum(col("__t")) / n
    val syy = sum(col("__y") * col("__y")) -
      sum(col("__y")) * sum(col("__y")) / n
    val sxy = sum(col("__t") * col("__y")) -
      sum(col("__t")) * sum(col("__y")) / n
    val slope = sxy / sxx
    val ok = n > 1 && sxx > 0
    pts.groupBy(col("cohort"))
      .agg(
        n.cast("long").as("n_weeks"),
        roundStable(when(ok, slope), digits).as("slope"),
        roundStable(when(ok && syy > 0, sxy * sxy / (sxx * syy)),
          digits).as("r2"),
        roundStable(when(ok && slope < 0, -lit(0.693147) / slope),
          digits).as("half_life_weeks"))
  }

  /** Neyman-optimal sampling allocation across strata (Neyman 1934) —
    * HOW MANY rows to sample per stratum for a fixed total budget:
    * `n_h ∝ N_h·σ_h`, which minimizes the variance of the stratified
    * mean (proportional allocation oversamples big quiet strata and
    * starves small noisy ones — at 100 TB the difference is the whole
    * point of stratifying). Integerization by largest remainder with
    * the remainders 6dp-ROUNDED before ranking (tiebreak stratum
    * order) so both engines hand out the leftover units identically;
    * allocations cap at the stratum's population. Zero-variance or
    * single-row strata get weight 0 — there is nothing to learn from
    * a second row of a constant stratum (documented; their budget
    * flows to the others). One moments agg + windows over the
    * O(#strata) rows.
    */
  def neymanAllocation(df: DataFrame, strataCols: Seq[String],
                       valueCol: String, totalN: Long,
                       digits: Int = 6): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(totalN > 0, s"need totalN > 0, got $totalN")
    val keyCols = strataCols.map(col)
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sqrt(var_samp(col(valueCol))), lit(0.0)).as("__sd"))
    val wAll = Window.partitionBy(lit(1))
    val wRank = Window.partitionBy(lit(1))
      .orderBy(col("__remr").desc +: keyCols.map(_.asc): _*)
    val mass = col("n_rows").cast("double") * col("__sd")
    val staged = cells
      .withColumn("__mass", mass)
      .withColumn("__tot", sum(col("__mass")).over(wAll))
      .withColumn("__raw", when(col("__tot") > 0,
        lit(totalN.toDouble) * col("__mass") / col("__tot"))
        .otherwise(lit(0.0)))
      .withColumn("__base", floor(col("__raw")).cast("long"))
      .withColumn("__remr", roundStable(col("__raw") - col("__base"), digits))
      .withColumn("__left",
        lit(totalN) - sum(col("__base")).over(wAll))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("alloc_n",
        least(col("n_rows"),
          col("__base") + when(col("__rk") <= col("__left"), 1L)
            .otherwise(0L)))
    staged.select(keyCols ++ Seq(col("n_rows"),
      roundStable(col("__sd"), digits).as("sd"),
      roundStable(col("__raw"), digits).as("alloc_raw"),
      col("alloc_n"),
      roundStable(col("alloc_n").cast("double") /
        col("n_rows").cast("double"), digits).as("sampling_frac")): _*)
  }

  /** Standardized-mean-difference balance table (Austin 2009) — the
    * covariate-balance audit before any observational A-vs-B claim:
    * per covariate, `SMD = (x̄_A − x̄_B) / √((s²_A + s²_B)/2)` — the
    * scale-free imbalance measure (a t-test conflates imbalance with
    * sample size; SMD does not), with the conventional |SMD| > 0.1
    * flag compared on 6dp-ROUNDED values. All covariates ride ONE
    * conditional-moments aggregation; the per-covariate rows unpivot
    * from that single aggregated row — the scan count does not grow
    * with the covariate list. Degenerate pooled variance emits NULL
    * SMD with both means visible.
    */
  def smdBalance(df: DataFrame, isA: Column, metricCols: Seq[String],
                 digits: Int = 6): DataFrame = {
    require(metricCols.nonEmpty, "need at least one covariate")
    val aggs = metricCols.flatMap { m =>
      val x = col(m).cast("double")
      Seq(
        avg(when(isA, x)).as(s"__ma_$m"),
        avg(when(!isA, x)).as(s"__mb_$m"),
        var_samp(when(isA, x)).as(s"__va_$m"),
        var_samp(when(!isA, x)).as(s"__vb_$m"),
        count(when(isA, x)).as(s"__na_$m"),
        count(when(!isA, x)).as(s"__nb_$m"))
    }
    // ONE scan: the single aggregated row is pinned so the per-covariate
    // unpivot selects below do not each re-run the aggregation
    val one = df.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    val perMetric = metricCols.map { m =>
      val pooled = (col(s"__va_$m") + col(s"__vb_$m")) / lit(2.0)
      val smd = (col(s"__ma_$m") - col(s"__mb_$m")) / sqrt(pooled)
      val ok = pooled > 0
      one.select(
        lit(m).as("covariate"),
        col(s"__na_$m").as("n_a"), col(s"__nb_$m").as("n_b"),
        roundStable(col(s"__ma_$m"), digits).as("mean_a"),
        roundStable(col(s"__mb_$m"), digits).as("mean_b"),
        roundStable(when(ok, smd), digits).as("smd"),
        when(ok, (abs(roundStable(smd, digits)) > lit(0.1)).cast("long"))
          .as("imbalanced"))
    }
    perMetric.reduce(_ union _)
  }

  /** Tukey-style post-hoc pairwise comparisons per key — WHICH groups
    * differ, the question [[anovaF]]'s single F deliberately does not
    * answer: for every level pair, the mean difference and the
    * studentized-range statistic `q = |x̄ᵢ − x̄ⱼ| / √((MSW/2)(1/nᵢ +
    * 1/nⱼ))` against the POOLED within-group variance (that pooling —
    * not per-pair t-tests — is what keeps the family honest; compare
    * q to the studentized-range critical value for (k, N−k) offline).
    * Cells reduce first (one moments agg); MSW rides a window over the
    * O(#keys × #levels) cell rows; the pair table is a self-join of
    * cells on the key with `lvl_a < lvl_b` — O(#levels²) per key,
    * bounded by the factor's cardinality, never by the data. Pairs
    * with MSW ≤ 0 or a single-row cell emit NULL q.
    */
  def tukeyPairs(df: DataFrame, keys: Seq[String], factorCol: Column,
                 yCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val y = yCol.cast("double")
    val cells = df.filter(y.isNotNull)
      .groupBy(keyCols :+ factorCol.as("__lvl"): _*)
      .agg(count(y).as("__n"), avg(y).as("__m"),
        sum(y * y).as("__ss"), sum(y).as("__s"))
    val wAll = Window.partitionBy(keyCols: _*)
    val nD = col("__n").cast("double")
    val bigN = sum(col("__n")).over(wAll).cast("double")
    val k = count(lit(1)).over(wAll).cast("double")
    val ssw = sum(col("__ss") - col("__s") * col("__s") / col("__n"))
      .over(wAll)
    val withMsw = cells
      .withColumn("__msw", when(bigN > k, ssw / (bigN - k)))
    val a = withMsw.select(keyCols ++ Seq(col("__lvl").as("lvl_a"),
      col("__n").as("__na"), col("__m").as("__ma"), col("__msw")): _*)
    val b = withMsw.select(keyCols ++ Seq(col("__lvl").as("lvl_b"),
      col("__n").as("__nb"), col("__m").as("__mb")): _*)
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val se = sqrt(col("__msw") / lit(2.0) *
      (lit(1.0) / na + lit(1.0) / nb))
    val ok = col("__msw") > 0 && na > 0 && nb > 0
    require(keys.nonEmpty, "tukeyPairs needs at least one key column")
    a.join(b, keys).filter(col("lvl_a") < col("lvl_b"))
      .select(keyCols ++ Seq(col("lvl_a"), col("lvl_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        roundStable(col("__ma") - col("__mb"), digits).as("mean_diff"),
        roundStable(when(ok, abs(col("__ma") - col("__mb")) / se),
          digits).as("q_stat")): _*)
  }

  /** L-moment summary per key (Hosking, JRSS-B 1990) — the
    * order-statistics alternative to classical moments: L-scale,
    * L-skewness and L-kurtosis are defined for ANY distribution with
    * a finite mean, are far less outlier-volatile than moment skew /
    * kurtosis (each value enters linearly, never cubed), and are the
    * standard regional-frequency-analysis fingerprint for "which
    * distribution family is this". Probability-weighted moments
    * `b_r = (1/n)·Σ C(i−1, r)/C(n−1, r) · x₍ᵢ₎` from ONE rank window
    * over the (value, tie)-ordered series, then the closed Hosking
    * combinations; ratios τ = l₂/l₁, τ₃ = l₃/l₂, τ₄ = l₄/l₂. Keys
    * with n < 4 emit NULL higher ratios; τ requires l₁ ≠ 0.
    */
  def lMoments(df: DataFrame, keys: Seq[String], valueCol: String,
               tieCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val base = df.filter(col(valueCol).isNotNull)
    val wOrd = Window.partitionBy(keyCols: _*)
      .orderBy(col(valueCol), tieCol)
    val x = col(valueCol).cast("double")
    val i = col("__i").cast("double")
    val n = count(lit(1)).cast("double")
    val b0 = avg(x)
    val b1 = sum((i - lit(1.0)) * x) / (n * (n - lit(1.0)))
    val b2 = sum((i - lit(1.0)) * (i - lit(2.0)) * x) /
      (n * (n - lit(1.0)) * (n - lit(2.0)))
    val b3 = sum((i - lit(1.0)) * (i - lit(2.0)) * (i - lit(3.0)) * x) /
      (n * (n - lit(1.0)) * (n - lit(2.0)) * (n - lit(3.0)))
    val l1 = b0
    val l2 = lit(2.0) * b1 - b0
    val l3 = lit(6.0) * b2 - lit(6.0) * b1 + b0
    val l4 = lit(20.0) * b3 - lit(30.0) * b2 + lit(12.0) * b1 - b0
    val ok = n > 3
    base.withColumn("__i", row_number().over(wOrd))
      .groupBy(keyCols: _*)
      .agg(
        n.cast("long").as("n"),
        roundStable(l1, digits).as("l1"),
        roundStable(when(n > 1, l2), digits).as("l2"),
        roundStable(when(ok, l3), digits).as("l3"),
        roundStable(when(ok, l4), digits).as("l4"),
        roundStable(when(n > 1 && abs(l1) > 0, l2 / l1), digits)
          .as("l_cv"),
        roundStable(when(ok && abs(l2) > 0, l3 / l2), digits)
          .as("l_skew"),
        roundStable(when(ok && abs(l2) > 0, l4 / l2), digits)
          .as("l_kurt"))
  }

  /** Gumbel extreme-value fit + return levels per key, by the method
    * of L-moments (Hosking 1990; the EVT practice standard for block
    * maxima): feed it per-period MAXIMA (daily/hourly peaks) and get
    * `β = l₂/ln 2`, `μ = l₁ − γβ`, and the T-period return levels
    * `x_T = μ − β·ln(−ln(1 − 1/T))` for T = 10 and 100 — "the spike
    * this monitor should see once a quarter / once a decade", the
    * principled extrapolation [[tailRisk]]'s empirical VaR cannot
    * reach (an empirical p99 of 30 maxima says nothing about the
    * 1-in-100 event; a fitted tail does, and says HOW MUCH). Rides
    * [[lMoments]]' own 6dp-ROUNDED l₁/l₂ (the q247 chaining
    * discipline), with γ, ln 2 and both −ln(−ln·) factors pinned as
    * shared literals — every transcendental a constant, so both
    * engines replay the identical arithmetic. Keys with n < 2 or
    * l₂ ≤ 0 emit NULL fit with the L-moments visible.
    */
  def gumbelReturn(df: DataFrame, keys: Seq[String], valueCol: String,
                   tieCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val lm = lMoments(df, keys, valueCol, tieCol, digits)
    val beta = col("l2") / lit(0.693147)           // l2 / ln 2
    val mu = col("l1") - lit(0.577216) * beta      // Euler–Mascheroni
    val ok = col("l2").isNotNull && col("l2") > 0
    lm.select(keyCols ++ Seq(
      col("n"), col("l1"), col("l2"),
      roundStable(when(ok, beta), digits).as("beta"),
      roundStable(when(ok, mu), digits).as("mu"),
      roundStable(when(ok, mu + beta * lit(2.250367)), digits)
        .as("return_10"),                          // −ln(−ln 0.9)
      roundStable(when(ok, mu + beta * lit(4.600149)), digits)
        .as("return_100")): _*)                    // −ln(−ln 0.99)
  }

  /** Hill tail-index estimator per key (Hill 1975) — the
    * peaks-over-threshold companion to [[gumbelReturn]]'s block-maxima
    * EVT: how HEAVY the upper tail is, from the top k+1 order
    * statistics alone: `γ̂ = (1/k) Σ_{i≤k} ln(X_(i) / X_(k+1))` (mean
    * log-excess over the threshold order statistic) and the Pareto
    * index `α̂ = 1/γ̂`. α ≈ 2-4 = the heavy-tail regime where p99s and
    * maxima are sample-size artifacts (and where q241's hub/salting
    * logic starts to matter); γ → 0 = thin tail, extrapolate with A102
    * instead. One keyed rank window cut at k+1 rows, then one fold —
    * per-key state O(k), never data-scale. Ties rank arbitrarily but
    * contribute identical logs (value-deterministic). Keys with fewer
    * than k+1 POSITIVE values emit NULL (logs need X > 0, and the
    * threshold statistic must exist); an all-equal top block has γ̂ = 0
    * → NULL α (1/0 is not a tail index).
    */
  def hillTail(df: DataFrame, keys: Seq[String], valueCol: Column,
               k: Int, digits: Int = 6): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val keyCols = keys.map(col)
    val pos = df.select(keyCols :+ valueCol.cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull && col("__v") > 0)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__v").desc)
    val top = pos.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k + 1)
    val folded = top.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__m"),
        sum(when(col("__rk") <= k, log(col("__v")))).as("__sl"),
        min(when(col("__rk") === k + 1, col("__v"))).as("__thr"))
    val ok = col("__m") === k + 1
    val gamma = col("__sl") / lit(k.toDouble) - log(col("__thr"))
    folded.select(keyCols ++ Seq(
      lit(k).cast("long").as("k"),
      roundStable(when(ok, col("__thr")), digits).as("threshold"),
      roundStable(when(ok, gamma), digits).as("gamma"),
      roundStable(when(ok && gamma > 0, lit(1.0) / gamma), digits)
        .as("alpha")): _*)
  }

  /** Two-cohort log-rank test per key (Mantel 1966) — ARE the two
    * survival curves different, the inferential step after
    * [[kaplanMeier]] draws them: at each pooled event time the
    * observed cohort-A events are compared to the expectation
    * `d·n₁/n` under "no difference", with the hypergeometric variance
    * `d·(n₁/n)(n₂/n)(n−d)/(n−1)`; `z = Σ(O−E)/√ΣV`, χ² = z². The
    * whole test weights early and late times by their risk sets,
    * which is why it beats comparing medians or a fixed-horizon
    * share. Same scale shape as [[kaplanMeier]]: subjects reduce to
    * O(#distinct durations) rows first, two reverse-cumulative
    * windows give both risk sets from one keyed sort, and the closing
    * agg folds the tiny per-t table. Single-event times (n = 1)
    * contribute zero variance by the guard; keys with ΣV = 0 emit
    * NULL z with all counts visible.
    */
  def logRank(df: DataFrame, keys: Seq[String], durationCol: String,
              observedCol: Column, isGroupA: Column,
              digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val byT = df.groupBy(keyCols :+ col(durationCol).as("t"): _*)
      .agg(
        sum(when(isGroupA && observedCol, 1L).otherwise(0L)).as("__d1"),
        sum(when(isGroupA && !observedCol, 1L).otherwise(0L)).as("__c1"),
        sum(when(!isGroupA && observedCol, 1L).otherwise(0L)).as("__d2"),
        sum(when(!isGroupA && !observedCol, 1L).otherwise(0L)).as("__c2"))
    val wRev = Window.partitionBy(keyCols: _*).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val n1 = col("__n1").cast("double")
    val n2 = col("__n2").cast("double")
    val n = n1 + n2
    val d = (col("__d1") + col("__d2")).cast("double")
    val e1 = d * n1 / n
    val v = when(n > 1,
      d * (n1 / n) * (n2 / n) * ((n - d) / (n - lit(1.0))))
      .otherwise(lit(0.0))
    val perT = byT
      .withColumn("__n1", sum(col("__d1") + col("__c1")).over(wRev))
      .withColumn("__n2", sum(col("__d2") + col("__c2")).over(wRev))
      .withColumn("__e1", when(d > 0, e1))
      .withColumn("__v", when(d > 0, v))
    val oMinusE = sum(col("__d1")).cast("double") - sum(col("__e1"))
    val vs = sum(col("__v"))
    perT.groupBy(keyCols: _*)
      .agg(
        sum(col("__d1") + col("__c1")).as("n_a"),
        sum(col("__d2") + col("__c2")).as("n_b"),
        sum(col("__d1")).as("events_a"),
        sum(col("__d2")).as("events_b"),
        roundStable(sum(col("__e1")), digits).as("expected_a"),
        roundStable(when(vs > 0, oMinusE / sqrt(vs)), digits).as("z"),
        roundStable(when(vs > 0, oMinusE * oMinusE / vs), digits)
          .as("chi2"))
  }

  /** Bartlett's test per key (Bartlett 1937) — are the k group
    * VARIANCES equal: the assumption [[anovaF]] leans on, and a drift
    * readout in its own right (a metric whose spread diverges across
    * segments is degrading even when means agree — the parametric,
    * more powerful sibling of A83's rank-robust Brown–Forsythe).
    * `T = ((N−k)·ln(s²_p) − Σ(nᵢ−1)·ln(s²ᵢ)) / C` with the usual
    * small-sample correction C; T ~ χ²(k−1) under normality. Two
    * moment aggregations like [[anovaF]]. The per-cell `ln` is
    * guarded INSIDE the fold (a zero-variance cell would -Inf/throw
    * before the outer verdict could mask it); keys with any cell
    * n < 2 or zero variance emit NULL T with counts visible.
    */
  def bartlett(df: DataFrame, keys: Seq[String], factorCol: Column,
               yCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val y = yCol.cast("double")
    val cells = df.filter(y.isNotNull)
      .groupBy(keyCols :+ factorCol.as("__lvl"): _*)
      .agg(count(y).as("__n"), var_samp(y).as("__v"))
    val nD = col("__n").cast("double")
    val bigN = sum(col("__n")).cast("double")
    val k = count(lit(1)).cast("double")
    val ssw = sum(when(col("__v").isNotNull, (nD - lit(1.0)) * col("__v")))
    val sp2 = ssw / (bigN - k)
    val lnSum = sum(when(col("__v") > 0, (nD - lit(1.0)) * log(col("__v"))))
    val invSum = sum(when(nD > 1, lit(1.0) / (nD - lit(1.0))))
    val c = lit(1.0) + (invSum - lit(1.0) / (bigN - k)) /
      (lit(3.0) * (k - lit(1.0)))
    val t = ((bigN - k) * log(sp2) - lnSum) / c
    val ok = k > 1 && bigN > k && min(col("__n")) > 1 &&
      min(col("__v")) > 0 && sp2 > 0
    cells.groupBy(keyCols: _*)
      .agg(
        k.cast("long").as("k_groups"), bigN.cast("long").as("n"),
        (k - lit(1.0)).cast("long").as("df"),
        roundStable(when(bigN > k, sp2), digits).as("pooled_var"),
        roundStable(when(ok, t), digits).as("bartlett_t"))
  }

  /** Nelson–Aalen cumulative-hazard estimator per key (Nelson 1972,
    * Aalen 1978) — the hazard-scale twin of [[kaplanMeier]]: `H(t) =
    * Σ_{t_j ≤ t} d_j/n_j`, the thing to plot when the QUESTION is
    * rate-shaped ("is risk accelerating?" — a straight H line is
    * constant hazard, convex is acceleration) and the quantity
    * hazard-ratio models are fit against. Emits the Poisson-form
    * variance `Σ d_j/n_j²` and the Fleming–Harrington survival
    * `exp(−H)` — KM's product and exp(−H) agree to O(d/n²), and the
    * gap between them at a given t is a small-risk-set warning flag.
    * Identical scale shape to [[kaplanMeier]]: subjects reduce to
    * O(#distinct durations) rows FIRST, then two cumulative windows
    * over one keyed sort.
    */
  def nelsonAalen(df: DataFrame, keys: Seq[String], durationCol: String,
                  observedCol: Column, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val byT = df.groupBy(keyCols :+ col(durationCol).as("t"): _*)
      .agg(sum(when(observedCol, 1L).otherwise(0L)).as("__d"),
        sum(when(observedCol, 0L).otherwise(1L)).as("__c"))
    val wCum = Window.partitionBy(keyCols: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRev = Window.partitionBy(keyCols: _*).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val nD = col("__n").cast("double")
    byT
      .withColumn("__n", sum(col("__d") + col("__c")).over(wRev))
      .withColumn("cum_hazard", roundStable(
        sum(col("__d").cast("double") / nD).over(wCum), digits))
      .withColumn("hazard_var", roundStable(
        sum(col("__d").cast("double") / (nD * nD)).over(wCum), digits))
      .select(keyCols ++ Seq(col("t"), col("__n").as("n_risk"),
        col("__d").as("n_events"), col("__c").as("n_censored"),
        col("cum_hazard"), col("hazard_var"),
        roundStable(exp(-col("cum_hazard")), digits).as("fh_survival")): _*)
  }

  /** Two-sample capture–recapture population estimate (Chapman 1951 —
    * the bias-corrected Lincoln–Petersen): per key, how many distinct
    * items exist IN TOTAL given two overlapping observation windows —
    * `N̂ = (n₁+1)(n₂+1)/(m+1) − 1` from the distinct counts in window A,
    * window B, and both, with Seber's variance for the SE. The
    * "how many users/documents/entities have we NOT seen" estimator:
    * q244/q280 measure the overlap of two OBSERVED audiences; this
    * extrapolates past the observations to the unobserved remainder
    * (assumptions — closed population, independent captures — are the
    * caller's to argue; the arithmetic is exact). `observed_frac` is
    * the union count over N̂ — the coverage readout.
    *
    * Shape: one (key, item) aggregation collapses the event log to
    * per-item membership flags (the 100 TB reduction), one per-key
    * fold over items — no joins, no windows, no distinct-pair blowup.
    */
  def captureRecapture(df: DataFrame, keys: Seq[String], itemCol: Column,
                       inA: Column, inB: Column,
                       digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val perItem = df
      .groupBy(keyCols :+ itemCol.as("__item"): _*)
      .agg(max(when(inA, 1).otherwise(0)).as("__a"),
        max(when(inB, 1).otherwise(0)).as("__b"))
      .filter(col("__a") === 1 || col("__b") === 1)
    val st = perItem.groupBy(keyCols: _*)
      .agg(sum(col("__a")).cast("double").as("__n1"),
        sum(col("__b")).cast("double").as("__n2"),
        sum(col("__a") * col("__b")).cast("double").as("__m"))
    val n1 = col("__n1"); val n2 = col("__n2"); val m = col("__m")
    // N̂ ≥ max(n₁, n₂) ≥ 1 whenever the key has any item, so the
    // observed_frac division is safe by construction
    val nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val v = (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) /
      ((m + 1) * (m + 1) * (m + 2))
    st.select(keyCols ++ Seq(
      n1.cast("long").as("n_a"), n2.cast("long").as("n_b"),
      m.cast("long").as("n_both"),
      roundStable(nhat, digits).as("n_hat"),
      roundStable(sqrt(v), digits).as("se"),
      roundStable((n1 + n2 - m) / nhat, digits).as("observed_frac")): _*)
  }

  /** Shared staging for the OLS residual diagnostics ([[durbinWatson]],
    * [[cooksInfluence]], [[breuschPagan]]): per-(key, hour) mean series
    * (x = epoch hours as double — the [[theilSen]] convention: both
    * engines difference identical values), one keyed moments agg for
    * the fit, fit joined back so every row carries its residual. Keys
    * with a constant x (single hour) get NULL slope → NULL residuals,
    * which every consumer's guards pass through as NULL statistics.
    * The raw 100 TB is touched exactly once by the hourly agg; the
    * join-back is keyed on O(#keys) fit rows.
    */
  private def hourlyResiduals(df: DataFrame, keys: Seq[String],
                              tsCol: Column, valueCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val hourly = df
      .groupBy(keyCols :+ date_trunc("hour", tsCol).as("__h"): _*)
      .agg(avg(col(valueCol)).as("__y"))
      .withColumn("__x", unix_micros(col("__h")).cast("double") / 3.6e9)
    val fit = hourly.groupBy(keyCols: _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col("__x")).as("__mx"), avg(col("__y")).as("__my"),
        covar_pop(col("__y"), col("__x")).as("__cxy"),
        var_pop(col("__x")).as("__vx"))
      .withColumn("__b", when(col("__vx") > 0, col("__cxy") / col("__vx")))
      .withColumn("__a", col("__my") - col("__b") * col("__mx"))
    hourly.join(fit, keys)
      .withColumn("__e", col("__y") - col("__a") - col("__b") * col("__x"))
  }

  /** Durbin-Watson test per key (Durbin & Watson 1950) — are the OLS
    * trend residuals serially correlated: `DW = Σ(e_t − e_{t−1})² /
    * Σe_t²` over the time-ordered hourly residuals, plus the implied
    * first-order autocorrelation `ρ̂ ≈ 1 − DW/2`. DW ≈ 2 means the
    * trend line earned its error bars; DW → 0 (ρ̂ → 1) means the
    * residuals trend too, so A30's OLS slope CI is overconfident —
    * the honesty check on every trend readout (A39's ACF reads the
    * raw series; this reads what's LEFT after the fit). One lag
    * window over the O(#hours) residual series + one keyed agg;
    * constant-x keys emit NULL (no fit, no residuals).
    */
  def durbinWatson(df: DataFrame, keys: Seq[String], tsCol: Column,
                   valueCol: String, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__x"))
    val r = hourlyResiduals(df, keys, tsCol, valueCol)
      .withColumn("__ep", lag(col("__e"), 1).over(w))
    r.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_hours"),
        sum(col("__e") * col("__e")).as("__sse"),
        // first row's NULL lag drops out of the sum — the t ≥ 2 range
        sum((col("__e") - col("__ep")) * (col("__e") - col("__ep")))
          .as("__sd"))
      .select(keyCols ++ Seq(col("n_hours"),
        roundStable(when(col("__sse") > 0, col("__sd") / col("__sse")),
          digits).as("dw"),
        roundStable(when(col("__sse") > 0,
          lit(1.0) - col("__sd") / col("__sse") / 2), digits)
          .as("rho_hat")): _*)
  }

  /** Cook's-distance influence screen per key (Cook 1977) — WHICH
    * hours bend the trend line: leverage `h = 1/n + (x−x̄)²/Sxx`,
    * internally studentized residual `e/√(s²(1−h))`, and Cook's
    * `D = r²h/(p(1−h))` with p = 2; the `topN` highest-D hours per key
    * emitted with their fitted values (A4/A37 flag outliers in y; this
    * flags points that MOVE THE MODEL — a moderate outlier at the
    * series edge outranks a wild one at the center). Rank on 6dp-
    * rounded D with the hour as tiebreak (the q94 determinism
    * discipline). Windows ride the O(#hours) reduced series; n ≤ 2
    * keys emit NULL diagnostics (s² needs n−2 df).
    */
  def cooksInfluence(df: DataFrame, keys: Seq[String], tsCol: Column,
                     valueCol: String, topN: Int = 3,
                     digits: Int = 6): DataFrame = {
    require(topN >= 1, s"need topN >= 1, got $topN")
    val keyCols = keys.map(col)
    val wk = Window.partitionBy(keyCols: _*)
    val sxx = col("__n") * col("__vx")
    val h = lit(1.0) / col("__n") +
      (col("__x") - col("__mx")) * (col("__x") - col("__mx")) / sxx
    val r = hourlyResiduals(df, keys, tsCol, valueCol)
      .withColumn("__sse", sum(col("__e") * col("__e")).over(wk))
      .withColumn("__hl", h)
      .withColumn("__s2",
        when(col("__n") > 2, col("__sse") / (col("__n") - 2)))
      // s² = 0 (perfect fit) or h = 1 (two-point series) leave the
      // studentized residual undefined — NULL, never an ANSI 0-divide
      .withColumn("__t", when(col("__s2") > 0 && col("__hl") < 1,
        col("__e") / sqrt(col("__s2") * (lit(1.0) - col("__hl")))))
      .withColumn("__d", roundStable(col("__t") * col("__t") *
        col("__hl") / (lit(2.0) * (lit(1.0) - col("__hl"))), digits))
    val wTop = Window.partitionBy(keyCols: _*)
      .orderBy(col("__d").desc_nulls_last, col("__x"))
    r.withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= topN)
      .select(keyCols ++ Seq(col("rk"), col("__h").as("t"),
        roundStable(col("__y"), digits).as("y"),
        roundStable(col("__a") + col("__b") * col("__x"), digits)
          .as("fitted"),
        roundStable(col("__hl"), digits).as("leverage"),
        roundStable(col("__t"), digits).as("rstudent"),
        col("__d").as("cooks_d")): _*)
  }

  /** Inequality suite per key — the three standard concentration
    * indices beyond B-family Gini (q155), each answering a question
    * Gini blurs: **Theil** `T = (1/n)Σ(x/μ)ln(x/μ)` (Theil 1967 — the
    * only index that DECOMPOSES additively across subgroups, so
    * "how much inequality is between types vs within" is answerable),
    * **Atkinson(ε=1)** `A = 1 − geomean/μ` (Atkinson 1970 — an
    * explicit welfare reading: "what equal income gives the same
    * welfare"), and the **Palma ratio** top-10%-share over
    * bottom-40%-share (Palma 2011 — the readout that moves when the
    * TAILS move; Gini is most sensitive to the middle). Strictly
    * positive values only (ln; zero/negative rows are excluded and
    * counted — documented, the standard income-data convention). One
    * moments agg for Theil/Atkinson; Palma adds one keyed sort window
    * — boundary ties carry equal values, so the cut SUMS are
    * order-independent and engine-identical.
    */
  def inequality(df: DataFrame, keys: Seq[String], valueCol: Column,
                 digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val x = valueCol.cast("double")
    val base = df.filter(x.isNotNull && x > 0)
      .select(keyCols :+ x.as("__x"): _*)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__x"))
    val wk = Window.partitionBy(keyCols: _*)
    val ranked = base
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wk))
      .withColumn("__k40", floor(col("__n") * 0.4))
      .withColumn("__k10", floor(col("__n") * 0.1))
    val st = ranked.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"), avg(col("__x")).as("__mu"),
        avg(log(col("__x"))).as("__mlx"),
        sum(col("__x") * log(col("__x"))).as("__sxl"),
        sum(col("__x")).as("__sx"),
        sum(when(col("__rn") <= col("__k40"), col("__x"))
          .otherwise(0.0)).as("__b40"),
        sum(when(col("__rn") > col("__n") - col("__k10"), col("__x"))
          .otherwise(0.0)).as("__t10"))
    // Theil via the log identity: (1/n)Σ(x/μ)ln(x/μ)
    //   = Σ x·ln x/(n·μ) − ln μ
    val theil = col("__sxl") / (col("n") * col("__mu")) -
      log(col("__mu"))
    st.select(keyCols ++ Seq(col("n"),
      roundStable(col("__mu"), digits).as("mean"),
      roundStable(theil, digits).as("theil"),
      roundStable(lit(1.0) - exp(col("__mlx")) / col("__mu"), digits)
        .as("atkinson"),
      roundStable(when(col("__b40") > 0, col("__t10") / col("__b40")),
        digits).as("palma")): _*)
  }

  /** Jarque-Bera normality screen per key (Jarque & Bera 1980) —
    * `JB = n/6·(S² + K²/4)` from the sample skewness S and excess
    * kurtosis K (~χ²₂ under normality): the cheap gate before any
    * method that assumes Gaussian errors (A30's CIs, A31's t-test,
    * control limits). Everything from FOUR raw power sums folded to
    * central moments — one aggregation pass, the moments discipline,
    * identical arithmetic on both engines; constant keys (m₂ = 0)
    * emit NULL with n visible.
    */
  def jarqueBera(df: DataFrame, keys: Seq[String], valueCol: Column,
                 digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val x = valueCol.cast("double")
    val st = df.filter(x.isNotNull).groupBy(keyCols: _*)
      .agg(count(lit(1)).cast("double").as("__n"), avg(x).as("__m"),
        avg(x * x).as("__e2"), avg(x * x * x).as("__e3"),
        avg(x * x * x * x).as("__e4"))
    val mu = col("__m")
    val m2 = col("__e2") - mu * mu
    val m3 = col("__e3") - lit(3.0) * mu * col("__e2") +
      lit(2.0) * mu * mu * mu
    val m4 = col("__e4") - lit(4.0) * mu * col("__e3") +
      lit(6.0) * mu * mu * col("__e2") - lit(3.0) * mu * mu * mu * mu
    val s = when(m2 > 0, m3 / pow(m2, 1.5))
    val k = when(m2 > 0, m4 / (m2 * m2) - 3.0)
    st.select(keyCols ++ Seq(col("__n").cast("long").as("n"),
      roundStable(s, digits).as("skewness"),
      roundStable(k, digits).as("ex_kurtosis"),
      roundStable(col("__n") / 6 * (s * s + k * k / 4), digits)
        .as("jb")): _*)
  }

  /** Grubbs outlier screen per key (Grubbs 1950) — the single most
    * extreme observation's studentized distance `G = max|x−x̄|/s`
    * with the value and side attached: the "is the worst point
    * actually wild" readout (A4/A37 flag ALL points past a fence;
    * this names THE extreme one and how extreme, for comparison
    * against the caller's critical value — no p-table baked in).
    * Distinct values reduce first, so the argmax window rides
    * O(#distinct) rows; argmax on the 6dp-rounded G with the value
    * as tiebreak (low side wins an exact tie — deterministic both
    * engines). Keys with s = 0 or n < 3 emit NULL.
    */
  def grubbs(df: DataFrame, keys: Seq[String], valueCol: Column,
             digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val x = valueCol.cast("double")
    val st = df.filter(x.isNotNull).groupBy(keyCols: _*)
      .agg(count(lit(1)).cast("double").as("__n"), avg(x).as("__mu"),
        stddev_samp(x).as("__s"))
    val vals = df.filter(x.isNotNull)
      .groupBy(keyCols :+ x.as("__x"): _*).agg(count(lit(1)).as("__c"))
    val g = when(col("__s") > 0 && col("__n") >= 3,
      abs(col("__x") - col("__mu")) / col("__s"))
    val wTop = Window.partitionBy(keyCols: _*)
      .orderBy(col("__g").desc_nulls_last, col("__x").asc)
    vals.join(st, keys)
      .withColumn("__g", roundStable(g, digits))
      .withColumn("__rk", row_number().over(wTop))
      .filter(col("__rk") === 1)
      .select(keyCols ++ Seq(col("__n").cast("long").as("n"),
        col("__g").as("g"),
        roundStable(col("__x"), digits).as("extreme_value"),
        when(col("__g").isNull, lit(null).cast("string"))
          .when(col("__x") >= col("__mu"), "high").otherwise("low")
          .as("side")): _*)
  }

  /** Rank movers between two periods — the "movers and shakers"
    * leaderboard diff: entities ranked by a metric in each period
    * (dense ordering on the ROUNDED value with id tiebreak — the q94
    * determinism discipline), joined, and the top-`topN` by absolute
    * rank displacement emitted with both ranks and values. Rank delta
    * is the reader-proof signal a raw value delta isn't: +5% volume
    * means nothing if everyone grew 10%. Entities present in only one
    * period drop at the inner join (a debut isn't a MOVE — B62 flags
    * cardinality churn; this ranks the stayers). One keyed agg + two
    * O(#entities) rank windows.
    */
  def rankMovers(df: DataFrame, entityCol: String, metricCol: Column,
                 isBefore: Column, topN: Int = 20,
                 digits: Int = 6): DataFrame = {
    require(topN >= 1, s"need topN >= 1, got $topN")
    val agg = df.groupBy(col(entityCol).as("entity"), isBefore.as("__b"))
      .agg(roundStable(sum(metricCol), digits).as("__v"))
    val wB = Window.partitionBy(col("__b"))
      .orderBy(col("__v").desc, col("entity"))
    val ranked = agg.withColumn("__rk", row_number().over(wB).cast("long"))
    val before = ranked.filter(col("__b")).select(col("entity"),
      col("__v").as("value_before"), col("__rk").as("rank_before"))
    val after = ranked.filter(!col("__b")).select(col("entity"),
      col("__v").as("value_after"), col("__rk").as("rank_after"))
    before.join(after, "entity")
      .withColumn("rank_delta", col("rank_before") - col("rank_after"))
      .withColumn("mover_rank", row_number().over(Window.orderBy(
        abs(col("rank_delta")).desc, col("entity"))).cast("long"))
      .filter(col("mover_rank") <= topN)
  }

  /** Hurst exponent per key by the aggregated-variance method
    * (Beran 1994 §4.4; Taqqu, Teverovsky & Willinger 1995's estimator
    * survey): block-average the hourly series at sizes m ∈ 2,4,8,16,
    * regress `ln Var(X̄^(m))` on `ln m` — for long-range-dependent
    * series the variance of m-means decays as `m^(2H−2)`, so
    * `H = 1 + slope/2`. H ≈ 0.5 reads i.i.d. (aggregation kills
    * variance at 1/m), H → 1 reads persistent trends (averaging
    * doesn't help — the "how much does averaging buy" number that
    * decides whether a daily rollup of this key is trustworthy).
    * Complete blocks only (a trailing partial block is noise, and
    * dropping it is deterministic); levels with < 2 blocks or zero
    * variance drop out; keys with < 2 surviving levels emit NULL
    * (nothing to regress). One keyed index window over the O(#hours)
    * reduced series, one explode by the 4-literal level grid, two
    * keyed aggs — per-key state O(#hours), never raw-corpus scale.
    */
  def hurstExponent(df: DataFrame, keys: Seq[String], tsCol: Column,
                    valueCol: String, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val wIdx = Window.partitionBy(keyCols: _*).orderBy(col("__h"))
    val hourly = df
      .groupBy(keyCols :+ date_trunc("hour", tsCol).as("__h"): _*)
      .agg(avg(col(valueCol)).as("__y"))
      .withColumn("__t", row_number().over(wIdx).cast("long") - 1)
    val blocks = hourly
      .select(keyCols ++ Seq(col("__t"), col("__y"),
        explode(array((1 to 4).map(l => lit(1L << l)): _*)).as("__m")): _*)
      .groupBy(keyCols ++ Seq(col("__m"), (col("__t") / col("__m"))
        .cast("long").as("__blk")): _*)
      .agg(avg(col("__y")).as("__bm"), count(lit(1)).as("__cnt"))
      .filter(col("__cnt") === col("__m"))
    val lv = blocks.groupBy(keyCols :+ col("__m"): _*)
      .agg(var_pop(col("__bm")).as("__v"), count(lit(1)).as("__nb"))
      .filter(col("__nb") >= 2 && col("__v") > 0)
      .withColumn("__lx", log(col("__m").cast("double")))
      .withColumn("__ly", log(col("__v")))
    val slope = when(var_pop(col("__lx")) > 0,
      covar_pop(col("__ly"), col("__lx")) / var_pop(col("__lx")))
    lv.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_levels"),
        roundStable(slope, digits).as("var_slope"),
        roundStable(lit(1.0) + slope / 2, digits).as("hurst"))
  }

  /** Haar wavelet energy spectrum per key — WHERE the series'
    * variability lives on the scale axis: orthonormal Haar detail
    * coefficients `d_{l,j} = (S_L − S_R)/2^{l/2}` (S = half-block sums
    * of size 2^{l−1}) for levels 1..4, energy `E_l = Σ_j d²` and its
    * share of the total. All energy at level 1 reads hour-to-hour
    * noise; energy concentrating at coarse levels reads slow regime
    * structure — the scale-resolved complement of A112 (which finds
    * ONE period; this bins ALL the variance by scale). The 2^{l/2}
    * normalizer enters as the exact integer 2^l dividing d² — no
    * transcendental pow, bit-identical cross-engine. Complete blocks
    * only; shares ride a window over ≤ 4 rows per key.
    */
  def waveletEnergy(df: DataFrame, keys: Seq[String], tsCol: Column,
                    valueCol: String, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val wIdx = Window.partitionBy(keyCols: _*).orderBy(col("__h"))
    val hourly = df
      .groupBy(keyCols :+ date_trunc("hour", tsCol).as("__h"): _*)
      .agg(avg(col(valueCol)).as("__y"))
      .withColumn("__t", row_number().over(wIdx).cast("long") - 1)
    val d2 = hourly
      .select(keyCols ++ Seq(col("__t"), col("__y"),
        explode(array((1 to 4).map(l =>
          struct(lit(l).as("l"), lit(1L << l).as("m"))): _*)).as("__lm")): _*)
      .withColumn("__l", col("__lm.l")).withColumn("__m", col("__lm.m"))
      .groupBy(keyCols ++ Seq(col("__l"), col("__m"),
        (col("__t") / col("__m")).cast("long").as("__blk")): _*)
      .agg(sum(when((col("__t") % col("__m")) * 2 < col("__m"),
          col("__y")).otherwise(-col("__y"))).as("__d"),
        count(lit(1)).as("__cnt"))
      .filter(col("__cnt") === col("__m"))
    val wk = Window.partitionBy(keyCols: _*)
    d2.groupBy(keyCols :+ col("__l").as("level"): _*)
      .agg((sum(col("__d") * col("__d")) /
          first(col("__m")).cast("double")).as("__e"),
        count(lit(1)).as("n_blocks"))
      .withColumn("__tot", sum(col("__e")).over(wk))
      .select(keyCols ++ Seq(col("level"), col("n_blocks"),
        roundStable(col("__e"), digits).as("energy"),
        roundStable(when(col("__tot") > 0, col("__e") / col("__tot")),
          digits).as("energy_share")): _*)
  }

  /** Breusch-Pagan heteroscedasticity screen per key (Breusch & Pagan
    * 1979; Koenker 1981's studentized LM = n·R² form — the one that
    * doesn't assume normal errors): does the residual VARIANCE drift
    * with x — `LM = n · corr(e², x)²`, ~χ²₁ under homoscedasticity,
    * signed `z = sign(slope)·√LM` for direction (variance growing or
    * shrinking over time). Fan-shaped residuals mean A30's single s²
    * understates late-series error — the second honesty check next to
    * [[durbinWatson]]. Everything from the same per-key moments over
    * the O(#hours) residuals; degenerate keys (constant x or constant
    * e²) emit NULL.
    */
  def breuschPagan(df: DataFrame, keys: Seq[String], tsCol: Column,
                   valueCol: String, digits: Int = 6): DataFrame = {
    val keyCols = keys.map(col)
    val e2 = col("__e") * col("__e")
    // corr from raw sample moments, guarded — Spark's corr divides
    // 0/0 under ANSI when a side is constant (e.g. a perfect fit)
    val r = when(col("__ve") > 0 && col("__vxs") > 0,
      col("__cs") / sqrt(col("__ve") * col("__vxs")))
    hourlyResiduals(df, keys, tsCol, valueCol)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_hours"),
        covar_samp(e2, col("__x")).as("__cs"),
        var_samp(e2).as("__ve"), var_samp(col("__x")).as("__vxs"),
        covar_pop(e2, col("__x")).as("__cex"),
        first(col("__vx")).as("__vxx"))
      .withColumn("__r", r)
      .select(keyCols ++ Seq(col("n_hours"),
        roundStable(when(col("__vxx") > 0, col("__cex") / col("__vxx")),
          digits).as("aux_slope"),
        roundStable(col("__r") * col("__r"), digits).as("r2_aux"),
        roundStable(col("n_hours") * col("__r") * col("__r"), digits)
          .as("lm"),
        roundStable(signum(col("__cex")) *
          sqrt(col("n_hours") * col("__r") * col("__r")), digits)
          .as("z")): _*)
  }

  /** Per-segment Misra-Gries GUARANTEE verdict (r15) — the q62/q68
    * sketch discipline applied to [[graft.functions.FreqSketchAgg]],
    * the one sketch family that was still spec-only: the tracked
    * SURVIVOR SET is partition/merge-order dependent (engine content no
    * SQL oracle can recompute), but the mergeable-summaries guarantee
    * (Misra & Gries 1982; Agarwal et al. PODS'12) is not. Per segment,
    * with N rows and capacity k, after ANY combination of updates and
    * merges:
    *
    *  - every tracked counter UNDERESTIMATES its true count by at most
    *    N/(k+1) (and never overestimates), and
    *  - every item with true count > N/(k+1) IS tracked.
    *
    * Both flatten to 1/0 verdicts over the EXACT per-(segment, item)
    * counts computed in the same query; `n_rows` rides by value. The
    * caller plants skew so the heavy-hitter clause is non-vacuous and
    * picks capacity << per-segment vocabulary so eviction genuinely
    * fires (a capacity that swallows the vocabulary verifies nothing —
    * the sketch degenerates to an exact map).
    *
    * At 100 TB the verdict stage (the exact per-item groupBy) is the
    * part you drop — or rather restrict to the sketch's own candidate
    * set, which is exactly what [[graft.text.Corpus.topKTokens]]'s
    * second pass does; this verdict exists so the small-SF gate asserts
    * the sketch's CONTRACT, not just its plumbing.
    */
  def mgVerdict(df: DataFrame, segCol: String, itemCol: String,
      capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val sk = df.groupBy(col(segCol)).agg(
      graft.functions.FreqSketchAgg.freqSketch(col(itemCol), capacity)
        .as("__sk"))
    val tracked = sk.select(col(segCol), explode(col("__sk")))
      .withColumnRenamed("key", "item")
      .withColumnRenamed("value", "reported")
    val exact = df.groupBy(col(segCol), col(itemCol).as("item"))
      .agg(count(lit(1)).as("true_cnt"))
    mgVerdictFrom(exact, tracked, segCol, capacity)
  }

  /** Verdict assembly from an exact count table and a tracked-item
    * table — split out so the negative specs can DOCTOR the tracked
    * side (inflate a counter, drop a heavy item, smuggle an alien item)
    * and prove each gate flips.
    */
  private[graft] def mgVerdictFrom(exact: DataFrame, tracked: DataFrame,
      segCol: String, capacity: Int): DataFrame = {
    val bound = exact.groupBy(col(segCol))
      .agg(sum(col("true_cnt")).as("n_rows"))
      .withColumn("__bound", col("n_rows").cast("double") / (capacity + 1))
    // tracked-side clause: each survivor exists in the corpus, never
    // overcounts, and undercounts by at most N/(k+1); an alien item
    // (NULL true_cnt) fails, not vacuously passes
    val tchk = tracked.join(exact, Seq(segCol, "item"), "left")
      .join(bound.select(col(segCol), col("__bound")), Seq(segCol))
      .groupBy(col(segCol))
      .agg(count(lit(1)).as("__n_tracked"),
        min(when(col("true_cnt").isNotNull &&
            col("reported") <= col("true_cnt") &&
            (col("true_cnt") - col("reported")).cast("double") <=
              col("__bound"), 1L).otherwise(0L)).as("__under_ok"))
    // coverage clause: no item above the guarantee threshold missing
    val miss = exact.join(bound, Seq(segCol))
      .filter(col("true_cnt").cast("double") > col("__bound"))
      .join(tracked.select(col(segCol), col("item")),
        Seq(segCol, "item"), "left_anti")
      .groupBy(col(segCol)).agg(count(lit(1)).as("__miss"))
    // an EMPTY tracked set is legal MG output for a segment with no
    // heavy items (uniform counts: the merge pivot ties with every
    // counter and cancels all of them — observed, not hypothetical),
    // so the tracked-side clauses are VACUOUSLY true there; coverage
    // is what fails if emptiness ever swallows a genuine heavy hitter
    bound.join(tchk, Seq(segCol), "left").join(miss, Seq(segCol), "left")
      .select(col(segCol), col("n_rows"),
        lit(capacity.toLong).as("capacity"),
        (coalesce(col("__n_tracked"), lit(0L)) <= capacity.toLong)
          .cast("bigint").as("tracked_bound_ok"),
        coalesce(col("__under_ok"), lit(1L)).as("underestimate_ok"),
        (coalesce(col("__miss"), lit(0L)) === 0L).cast("bigint")
          .as("coverage_ok"))
  }
}
