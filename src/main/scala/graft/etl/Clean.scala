package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cleaning operators — dedup, missing-value interpolation, outlier
  * clipping. Reference: dags/airflow_dag_calidad_aire.py:156-180.
  *
  * Scale notes: every operator here partitions by the group key — at
  * 100 TB the window work parallelizes across keys with one shuffle on the
  * key, no global sort. Keys are sensor/user series, so per-key cardinality
  * is bounded (hourly data → ~10^5 rows/key/decade) and skew is not a
  * concern; a pathological hot key would be handled by AQE skew splitting
  * on the preceding shuffle.
  */
object Clean {

  /** Exact deduplication on a business key with a deterministic survivor
    * (first row by `orderCols`). The reference's `drop_duplicates`
    * (dag:180) keeps the first physical row; a distributed engine has no
    * "first physical row", so we make survivorship explicit and
    * reproducible via row_number over (key, order).
    */
  def dedupExact(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-group, ordered linear interpolation of nulls in `valueCol`
    * (pandas `interpolate(method='linear')`, dag:162-168), expressed with
    * window functions only:
    *
    *   prev = last non-null value at or before this row
    *   next = first non-null value at or after this row
    *   gap position = rows since prev / rows from prev to next
    *   interpolated = prev + (next - prev) * position
    *
    * Boundary semantics match pandas `interpolate` defaults: leading nulls
    * stay null, trailing nulls forward-fill from the last known value.
    * `maxGap` bounds the fill like pandas' `limit=` (dag:167): runs of
    * nulls longer than `maxGap` are left null.
    */
  def interpolateLinear(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      maxGap: Int = Int.MaxValue): DataFrame =
    interpolateLinear(df, keyCol, orderCols, Seq(valueCol), maxGap)

  /** Multi-column variant — the reference interpolates all 7 numeric
    * columns per station (dag:161-167). All columns share ONE keyed
    * shuffle and one ascending + one descending in-partition sort: every
    * per-column window function rides the same two window specs, so
    * Catalyst plans exactly two Window operators over a single Exchange
    * (asserted in PlanSpec) instead of re-shuffling per column.
    */
  def interpolateLinear(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCols: Seq[String],
      maxGap: Int): DataFrame = {
    val wAsc = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)

    // Row index of the nearest non-null neighbor in each direction.
    //
    // PERFORMANCE: the "next" side must NOT use a (0, unboundedFollowing)
    // frame — Spark's UnboundedFollowingWindowFunctionFrame recomputes the
    // aggregate from scratch per row, i.e. O(n²) per key (measured: hangs
    // at 8760 rows/key while being invisible at the test SF's ~70).
    // A reversed-order running frame computes the same value in O(n); the
    // two window specs share the partition key so there's still exactly
    // one shuffle, just an extra in-partition sort.
    val wDesc = Window.partitionBy(keyCol).orderBy(orderCols.map(c => col(c).desc): _*)
    val ascRun  = wAsc.rowsBetween(Window.unboundedPreceding, 0)
    val descRun = wDesc.rowsBetween(Window.unboundedPreceding, 0)
    val withIdx = df.withColumn("__rn", row_number().over(wAsc))

    // The neighbor value and its row index always come from the SAME row
    // (the nearest non-null one), so they travel as ONE struct per
    // direction — 2 window aggregates per column instead of 4, halving
    // the per-row window bookkeeping on the pipeline's hottest stage.
    val withNeighbors = valueCols.foldLeft(withIdx) { (acc, c) =>
      val v = col(c)
      val tagged = when(v.isNotNull, struct(col("__rn").as("i"), v.as("v")))
      acc
        .withColumn(s"__p_$c", last(tagged, ignoreNulls = true).over(ascRun))
        .withColumn(s"__n_$c", last(tagged, ignoreNulls = true).over(descRun))
    }
    val filled = valueCols.foldLeft(withNeighbors) { (acc, c) =>
      val v = col(c)
      val (pv, pi) = (col(s"__p_$c.v"), col(s"__p_$c.i"))
      val (nv, ni) = (col(s"__n_$c.v"), col(s"__n_$c.i"))
      acc.withColumn(
        c,
        when(v.isNotNull, v)
          // interior gap with both neighbors, within the fill limit
          .when(
            pv.isNotNull && nv.isNotNull && (col("__rn") - pi <= maxGap),
            pv + (nv - pv) *
              (col("__rn") - pi).cast("double") /
              (ni - pi).cast("double"))
          // trailing nulls: pandas interpolate forward-fills, within limit
          .when(pv.isNotNull && (col("__rn") - pi <= maxGap), pv)
          .otherwise(lit(null)))
    }
    filled.drop("__rn" +:
      valueCols.flatMap(c => Seq(s"__p_$c", s"__n_$c")): _*)
  }

  /** Null imputation with the group mean (the simpler sibling of
    * [[interpolateLinear]] for unordered data): one stats aggregation
    * joined back onto the fact side, nulls coalesced to the mean.
    * Groups that are entirely null stay null (no global fallback).
    *
    * No static broadcast hint: one row per group, but the operator is
    * generic over `keys` — a high-cardinality caller (per-user stats)
    * must not inherit a forced driver collect. AQE broadcasts at
    * runtime when the stats side fits (plan-spec-asserted for q18).
    */
  def imputeMean(df: DataFrame, keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map(c => avg(col(c)).as(s"__mu_$c"))
    val stats = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val joined = df.join(stats, keys)
    valueCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, coalesce(col(c), col(s"__mu_$c")))
    }.drop(valueCols.map(c => s"__mu_$c"): _*)
  }

  /** IQR outlier clipping per group (dag:170-177): clip to
    * [Q1 - k·IQR, Q3 + k·IQR] with exact linear-interpolated percentiles
    * (matches pandas `quantile` and DuckDB `quantile_cont`). The reference
    * computes bounds per 10k-row chunk — an artifact of pandas chunking;
    * the semantically-intended unit is the group, which is what we use.
    *
    * At 100 TB: swap `percentile` for `approx_percentile(c, p, err)` —
    * single-pass sketch, same call shape. Kept exact here because the
    * oracle compares exact quantiles.
    */
  def clipOutliersIqr(
      df: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      k: Double = 3.0): DataFrame = {
    val aggs = valueCols.flatMap { c =>
      Seq(
        expr(s"percentile($c, 0.25)").as(s"__q1_$c"),
        expr(s"percentile($c, 0.75)").as(s"__q3_$c"))
    }
    val bounds = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // bounds has one row per group; no static broadcast hint — AQE picks
    // the map-side join at runtime when the bounds side fits, and a
    // caller with a high-cardinality key keeps a safe shuffle join.
    val joined = df.join(bounds, keys)
    valueCols.foldLeft(joined) { (acc, c) =>
      val iqr = col(s"__q3_$c") - col(s"__q1_$c")
      val lo  = col(s"__q1_$c") - lit(k) * iqr
      val hi  = col(s"__q3_$c") + lit(k) * iqr
      acc.withColumn(c, when(col(c) < lo, lo).when(col(c) > hi, hi).otherwise(col(c)))
    }.drop(valueCols.flatMap(c => Seq(s"__q1_$c", s"__q3_$c")): _*)
  }
}
