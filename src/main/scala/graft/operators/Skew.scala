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
  /** The salted partial stage of [[saltedSum]], exposed so tests can
    * assert the salt actually spreads a hot key across buckets.
    *
    * The salt must NOT be a function of the data: salting on a value
    * column collapses to a single bucket exactly in the classic skew case
    * (a hot key whose rows share one default/zero value). A row-unique
    * source spreads every key evenly regardless of its values; the final
    * merge makes the output independent of the salt assignment.
    */
  private[graft] def saltedPartial(df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))

  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int): DataFrame =
    saltedPartial(df, keys, valueCol, buckets)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as("sum_value"), sum(col("__c")).as("n"))
      .withColumn("avg_value", col("sum_value") / col("n"))

  /** Salted join for a skewed left key: left rows get a random-ish salt in
    * [0, buckets), the (small) right side is exploded `buckets`× so every
    * salted left row still finds its match. Right side must be the small
    * side — its blowup is the price of splitting the hot key.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val r = right.withColumn("__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
