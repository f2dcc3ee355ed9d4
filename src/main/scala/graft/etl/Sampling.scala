package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling utilities.
  *
  * `DataFrame.sample(seed)` draws per-partition, so the sampled SET
  * changes whenever partitioning changes — useless for reproducible
  * pipelines. Hash-based sampling keys the decision on the ROW (id), so
  * the same rows are selected regardless of partitioning, cluster size,
  * or engine version, and a sample can be re-derived or audited later.
  */
object Sampling {

  /** Keep ~`fraction` of rows, decided by xxhash64(idCol, salt). */
  def deterministic(df: DataFrame, idCol: String, fraction: Double, salt: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(idCol), lit(salt)), lit(buckets)) <
      lit((fraction * buckets).toLong))
  }

  /** Stratified deterministic sampling: an independent hash-sample per
    * stratum with its own fraction (missing strata keep nothing).
    */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], salt: Long = 42L): DataFrame = {
    val buckets = 1000000L
    val h = pmod(xxhash64(col(idCol), lit(salt)), lit(buckets))
    val threshold = fractions.foldLeft(lit(0L)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.filter(h < threshold)
  }
}
