package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Column profiling — the "know your data" pass every pipeline runs
  * before trusting a new feed: per column, null count/rate, distinct
  * count/rate, in LONG format (one row per column) so downstream
  * validation rules join against it by column name.
  *
  * Scale shape: ONE aggregation over ONE scan computes every column's
  * metrics (a per-column loop would rescan the table per column — the
  * classic accidental O(cols·data) profiler); the wide one-row result
  * explodes to long form MAP-SIDE via an inline struct array. Multiple
  * exact `countDistinct`s plan through Catalyst's Expand (row
  * multiplier = #cols + 1 on the wire) — bounded and explicit; pass
  * `approxDistinct = true` to swap in HLL `approx_count_distinct`
  * (single-pass, no Expand) when profiling very wide tables at 100 TB,
  * where ±2% on distinct counts is the right trade.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false, digits: Int = 6): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      val nd = if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"), nd.as(s"__nd_$c"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val items = array(cols.map(c => struct(lit(c).as("column"),
      col(s"__nn_$c").as("__nn"), col(s"__nd_$c").as("__nd"))): _*)
    row.select(col("__n").as("n_rows"), explode(items).as("m"))
      .select(col("m.column").as("column"), col("n_rows"),
        (col("n_rows") - col("m.__nn")).as("n_null"),
        col("m.__nd").as("n_distinct"),
        roundStable(when(col("n_rows") > 0,
          (col("n_rows") - col("m.__nn")).cast("double") /
            col("n_rows")), digits).as("null_rate"),
        roundStable(col("m.__nd").cast("double") /
          greatest(col("m.__nn"), lit(1L)), digits).as("distinct_rate"))
  }

  /** Schema-health drift between two snapshots of the same table —
    * the pipeline tripwire a downstream join feels FIRST: per column,
    * both snapshots' [[profile]] rows side by side with the null-rate
    * delta and the distinct-count ratio, flagged when the null rate
    * moved more than `nullTol` (absolute) or the cardinality moved
    * more than `distinctRatio`× in either direction (an upstream
    * producer started emitting NULLs / ids collapsed to a constant /
    * a key exploded). B30's table diff compares ROWS of two tables;
    * this compares their STATISTICAL SHAPE — O(#columns) output, so
    * it is the one you can afford hourly at 100 TB (one aggregation
    * pass per snapshot, nothing pairwise). An empty snapshot yields
    * NULL rates — flagged, never divided by zero.
    */
  def profileDrift(before: DataFrame, after: DataFrame, cols: Seq[String],
                   nullTol: Double = 0.05, distinctRatio: Double = 2.0,
                   digits: Int = 6): DataFrame = {
    require(nullTol >= 0 && distinctRatio >= 1,
      s"need nullTol >= 0 and distinctRatio >= 1, got $nullTol/$distinctRatio")
    val a = profile(before, cols, digits = digits).select(col("column"),
      col("n_rows").as("rows_before"), col("null_rate").as("null_before"),
      col("n_distinct").as("nd_before"))
    val b = profile(after, cols, digits = digits).select(col("column"),
      col("n_rows").as("rows_after"), col("null_rate").as("null_after"),
      col("n_distinct").as("nd_after"))
    val dNull = col("null_after") - col("null_before")
    val ratio = when(col("nd_before") > 0,
      col("nd_after").cast("double") / col("nd_before"))
    a.join(b, "column")
      .withColumn("null_delta", roundStable(dNull, digits))
      .withColumn("distinct_ratio", roundStable(ratio, digits))
      .withColumn("flag",
        coalesce(abs(col("null_delta")) > nullTol, lit(true)) ||
        coalesce(col("distinct_ratio") > distinctRatio ||
          col("distinct_ratio") < 1.0 / distinctRatio, lit(true)))
  }
}
