package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Feature engineering — the reference's transform-phase derived columns,
  * re-expressed as pure Catalyst column expressions (codegen'd, no UDFs).
  *
  * Reference: dags/airflow_dag_calidad_aire.py:185-234 (AQI, category,
  * temporal features, pollution index).
  */
object Features {

  /** Piecewise-linear EPA AQI for a PM2.5-like reading.
    * Exact breakpoint math from airflow_dag_calidad_aire.py:185-199,
    * including the reference's 12.0/12.1-style segment gaps — we replicate
    * its arithmetic verbatim so results match the reference bit-for-bit.
    * A `when` chain stays inside whole-stage codegen.
    */
  def aqiPm25(pm25: Column): Column =
    when(pm25.isNull, lit(null))
      .when(pm25 <= 12.0, lit(50.0 / 12.0) * pm25)
      .when(pm25 <= 35.4, lit(50.0) + lit((100.0 - 50.0) / (35.4 - 12.1)) * (pm25 - lit(12.1)))
      .when(pm25 <= 55.4, lit(100.0) + lit((150.0 - 100.0) / (55.4 - 35.5)) * (pm25 - lit(35.5)))
      .when(pm25 <= 150.4, lit(150.0) + lit((200.0 - 150.0) / (150.4 - 55.5)) * (pm25 - lit(55.5)))
      .otherwise(lit(200.0) + lit((300.0 - 200.0) / (250.4 - 150.5)) * (pm25 - lit(150.5)))

  /** AQI → category label (airflow_dag_calidad_aire.py:202-218). */
  def airQualityCategory(aqi: Column): Column =
    when(aqi.isNull, lit("Unknown"))
      .when(aqi <= 50.0, lit("Good"))
      .when(aqi <= 100.0, lit("Moderate"))
      .when(aqi <= 150.0, lit("Unhealthy for Sensitive"))
      .when(aqi <= 200.0, lit("Unhealthy"))
      .otherwise(lit("Very Unhealthy"))

  /** Monday=0 … Sunday=6 weekday (pandas `dt.dayofweek` convention used by
    * the reference; equals DuckDB `isodow - 1`).
    */
  def weekdayMon0(ts: Column): Column = weekday(ts).cast("long")

  /** Temporal feature block (airflow_dag_calidad_aire.py:221-226).
    * All longs so the oracle's BIGINT schema matches exactly.
    */
  def withTemporalFeatures(df: DataFrame, tsCol: String): DataFrame = {
    val ts = col(tsCol)
    val hr = hour(ts).cast("long")
    val wd = weekdayMon0(ts)
    df.withColumn("hour", hr)
      .withColumn("weekday", wd)
      .withColumn("is_weekend", (wd >= 5).cast("long"))
      .withColumn("is_rush_hour", hr.isin(7, 8, 9, 17, 18, 19).cast("long"))
      .withColumn("month", month(ts).cast("long"))
      .withColumn("date", to_date(ts))
  }

  /** Weighted, per-column-normalized composite index
    * (airflow_dag_calidad_aire.py:229-234): sum(w_i * col_i / norm_i).
    * Terms are combined left-to-right so the floating-point evaluation
    * order matches an equivalent left-associative SQL `+` chain.
    */
  def compositeIndex(terms: Seq[(Column, Double, Double)]): Column =
    terms.map { case (c, norm, w) => (c / lit(norm)) * lit(w) }.reduce(_ + _)

  /** Exact equal-frequency discretization (the QuantileDiscretizer-style
    * feature-prep fit, but deterministic): per key, rank rows into
    * `nBins` ntile buckets on `(value, tieCol)` — the tiebreak makes the
    * bucketing reproducible across engines and partitionings — and
    * return the per-bin summary (count + value range) a model-training
    * pipeline bakes into its feature map. One keyed window shuffle; the
    * closing (key, bin) agg reuses the window's key partitioning.
    */
  def quantileBins(df: DataFrame, keys: Seq[String], valueCol: String,
                   tieCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val keyCols = keys.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(col(valueCol), col(tieCol))
    df.withColumn("bin", ntile(nBins).over(w).cast("long"))
      .groupBy(keyCols :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Leave-one-out target encoding with additive smoothing (the
    * high-cardinality categorical encoder gradient-boosting pipelines
    * standardize on; Micci-Barreca SIGKDD'01): each row's category is
    * replaced by the mean TARGET of the OTHER rows of that category,
    * shrunk toward the global mean by a prior weight `m` —
    * `enc = (Σ_c y − y_row + m·g) / (n_c − 1 + m)`. Leave-one-out is
    * the leakage guard (the row's own label never encodes itself);
    * the smoothing makes singleton categories fall out as exactly the
    * global mean with NO special case (`(0 + m·g)/(0 + m) = g`).
    *
    * Shape: one category aggregation (O(#categories)) joined back —
    * AQE broadcasts when it fits — plus one global one-row aggregate;
    * the encoding itself is a map-side expression. Rows with a NULL
    * target pass through with a NULL encoding (they contribute nothing
    * to the sums either).
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
                      m: Double, digits: Int = 6): DataFrame = {
    require(m > 0, s"need m > 0, got $m")
    val stats = df.groupBy(col(catCol))
      .agg(sum(col(targetCol)).as("__s"), count(col(targetCol)).as("__n"))
    val g = df.agg((sum(col(targetCol)) /
      count(col(targetCol))).as("__g"))
    df.join(stats, Seq(catCol), "left")
      .crossJoin(broadcast(g))
      .withColumn("te", roundStable(
        when(col(targetCol).isNotNull,
          (col("__s") - col(targetCol) + lit(m) * col("__g")) /
            (col("__n") - 1 + lit(m))), digits))
      .drop("__s", "__n", "__g")
  }

  /** RFM segmentation (recency / frequency / monetary) — the classic
    * customer-value grid every lifecycle program starts from: one row
    * per entity collapses to three quintile scores (1–5, 5 best:
    * most recent, most often, most spent) and the segment report
    * aggregates entities per (r, f, m) cell with the cell's average
    * raw metrics — ≤125 output rows regardless of entity count.
    *
    * Scores use the q204 explicit rank-bucket arithmetic
    * (`(rn−1)·5 DIV n + 1` over a (metric asc, id) `row_number`) —
    * never `ntile`, whose tie placement is engine-specific. Recency
    * ranks the LAST-SEEN instant ascending (oldest = 1, freshest = 5);
    * `recency_days` is measured against the dataset's own max date so
    * the query is reproducible with no wall-clock dependence. Shape:
    * one entity aggregation, then three rank windows over the ENTITY
    * rows — these are global sorts (the q204 trade, documented there):
    * they rank the aggregated entity table, never the raw corpus, and
    * quintile boundaries are inherently global. One closing cell agg.
    */
  def rfm(df: DataFrame, idCol: Column, tsCol: Column, amountCol: Column,
          digits: Int = 6): DataFrame = {
    val entities = df.groupBy(idCol.as("__id"))
      .agg(max(tsCol).as("__last"), count(lit(1)).as("__freq"),
        sum(amountCol).as("__money"))
    val anchor = df.agg(max(tsCol).as("__anchor"))
    def score(rn: String): Column =
      expr(s"CAST(($rn - 1) * 5 DIV __n + 1 AS INT)")
    entities
      .crossJoin(broadcast(anchor))
      .withColumn("__rdays",
        datediff(to_date(col("__anchor")), to_date(col("__last")))
          .cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("__rnr",
        row_number().over(Window.orderBy(col("__last"), col("__id")))
          .cast("long"))
      .withColumn("__rnf",
        row_number().over(Window.orderBy(col("__freq"), col("__id")))
          .cast("long"))
      .withColumn("__rnm",
        row_number().over(Window.orderBy(col("__money"), col("__id")))
          .cast("long"))
      .withColumn("r_score", score("__rnr"))
      .withColumn("f_score", score("__rnf"))
      .withColumn("m_score", score("__rnm"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_entities"),
        roundStable(avg(col("__rdays")), digits).as("avg_recency_days"),
        roundStable(avg(col("__freq")), digits).as("avg_frequency"),
        roundStable(avg(col("__money")), digits).as("avg_monetary"))
  }

  /** Decision-stump feature scoring — WHICH feature best separates a
    * binary label, and at what threshold: for every candidate feature
    * the Gini-impurity-minimizing single split (`≤ t` vs `> t`), its
    * impurity reduction, and the baseline impurity — the one-glance
    * feature-importance screen (and the exact quantity a tree
    * learner's root split would compute) that runs as PURE
    * aggregation: per-feature distinct values reduce first, ordered
    * prefix sums give every candidate split's two-sided class counts
    * (the A108 staging, totals from the LAST cumulative row), and
    * the argmin ranks on 6dp-ROUNDED impurity with a threshold
    * tiebreak. Scan count: ONE pass per feature (the union is over
    * projections of the same scan — Spark reuses it), state
    * O(#features × #distinct values). NULL labels count as negative
    * (documented); NULL feature values are excluded.
    */
  def bestStump(df: DataFrame, labelCol: Column,
                features: Seq[(String, Column)],
                digits: Int = 6): DataFrame = {
    require(features.nonEmpty, "need at least one candidate feature")
    val frames = features.map { case (name, f) =>
      df.filter(f.isNotNull)
        .select(lit(name).as("feature"), f.cast("double").as("v"),
          when(labelCol, 1L).otherwise(0L).as("__y"))
    }
    val cells = frames.reduce(_ union _)
      .groupBy(col("feature"), col("v"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__pos"))
    val wLoc = Window.partitionBy(col("feature")).orderBy(col("v"))
    val wCum = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFull = wLoc.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val staged = cells
      .withColumn("__cn", sum(col("__n")).over(wCum))
      .withColumn("__cp", sum(col("__pos")).over(wCum))
      .withColumn("__N", last(col("__cn")).over(wFull))
      .withColumn("__P", last(col("__cp")).over(wFull))
    def gini(p: Column) =
      lit(1.0) - p * p - (lit(1.0) - p) * (lit(1.0) - p)
    val cn = col("__cn").cast("double")
    val cp = col("__cp").cast("double")
    val nD = col("__N").cast("double")
    val pD = col("__P").cast("double")
    val gL = gini(cp / cn)
    val gR = gini((pD - cp) / (nD - cn))
    val after = (cn / nD) * gL + ((nD - cn) / nD) * gR
    val before = gini(pD / nD)
    val cand = staged.filter(col("__cn") < col("__N"))
      .withColumn("__after", roundStable(after, digits))
      .withColumn("__before", roundStable(before, digits))
    val wPick = Window.partitionBy(col("feature"))
      .orderBy(col("__after").asc, col("v").asc)
    cand.withColumn("__rk", row_number().over(wPick))
      .filter(col("__rk") === 1)
      .select(col("feature"), col("__N").as("n"),
        col("v").as("best_threshold"),
        col("__before").as("gini_before"),
        col("__after").as("gini_after"),
        roundStable(col("__before") - col("__after"), digits).as("gain"))
  }
}
