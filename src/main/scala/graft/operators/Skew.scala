package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; salting is
  * the explicit fallback for aggregations over pathological keys (one
  * key ≫ a partition) and for pre-AQE-style two-phase rollups.
  */
object Skew {

  /** Two-phase (salted) aggregation: a deterministic salt spreads each
    * key over `buckets` partial groups, which are then merged. Use when a
    * single group's rows exceed an executor partition. The partial
    * aggregate is the map-side combine Catalyst already does — salting
    * additionally bounds the *reduce-side* group size.
    *
    * sumCols/countCols are re-aggregated correctly; avg is derived from
    * sum/count rather than averaged-of-averages.
    */
  /** Salt expression in [0, buckets). Prefer `saltFrom = Some(uniqueCol)`
    * — a deterministic row key (event id, primary key) makes the partial
    * stage reproducible under task retry / stage recomputation. With no
    * such key the fallback is `monotonically_increasing_id()`, which is
    * NON-DETERMINISTIC across attempts: a recomputed partition can be
    * re-salted differently. The final merge keeps results correct either
    * way (sums/counts re-associate), but retried partials aren't
    * byte-identical — acceptable for aggregation, documented here.
    *
    * The salt must NOT come from a value column: salting on values
    * collapses to a single bucket exactly in the classic skew case (a hot
    * key whose rows share one default/zero value).
    */
  private def saltExpr(buckets: Int, saltFrom: Option[String]): Column =
    pmod(xxhash64(saltFrom.fold(monotonically_increasing_id())(col)), lit(buckets))

  /** The salted partial stage of [[saltedSum]], exposed so tests can
    * assert the salt actually spreads a hot key across buckets.
    */
  private[graft] def saltedPartial(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int, saltFrom: Option[String] = None): DataFrame =
    df.withColumn("__salt", saltExpr(buckets, saltFrom))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))

  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int,
      saltFrom: Option[String] = None): DataFrame =
    saltedPartial(df, keys, valueCol, buckets, saltFrom)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as("sum_value"), sum(col("__c")).as("n"))
      .withColumn("avg_value", col("sum_value") / col("n"))

  /** Salted join for a skewed left key: left rows get a salt in
    * [0, buckets), the (small) right side is exploded `buckets`× so every
    * salted left row still finds its match. Right side must be the small
    * side — its blowup is the price of splitting the hot key.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int,
      saltFrom: Option[String] = None): DataFrame = {
    val l = left.withColumn("__salt", saltExpr(buckets, saltFrom))
    val r = right.withColumn("__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
