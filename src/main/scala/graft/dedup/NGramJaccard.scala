package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram (word-shingle) Jaccard near-duplicate detection.
  *
  * Never all-pairs: an inverted index on shingles generates only pairs
  * that share at least one shingle —
  *
  *   docs → distinct shingle sets → explode → self-join on shingle →
  *   groupBy (a,b) count common → jaccard = c / (|A| + |B| − c)
  *
  * One shuffle on the shingle, one on the pair. At 100 TB the remaining
  * risk is shingle frequency skew (a shingle in f docs yields f² pair
  * rows); production pipelines drop shingles with document frequency
  * above a cap — any pair that only shares ultra-common shingles cannot
  * clear a meaningful Jaccard threshold anyway. Exposed via `maxDocFreq`
  * (disabled by default so the small-SF oracle stays exact).
  *
  * This exact operator doubles as the correctness oracle for the
  * probabilistic [[MinHashLsh]] path.
  */
object NGramJaccard {

  /** (id, shingles, n) where shingles is the distinct word-n-gram set. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(
        col(idCol),
        array_distinct(
          transform(
            sequence(lit(1), greatest(size(split(col(textCol), " ")) - (n - 1), lit(0))),
            i => concat_ws(" ", slice(split(col(textCol), " "), i, lit(n)))))
          .as("shingles"))
      .withColumn("n_sh", size(col("shingles")).cast("long"))

  /** Near-duplicate pairs (id_a < id_b) with exact Jaccard >= minJaccard.
    *
    * The exploded index is persisted (it feeds both sides of the
    * self-join — without this Spark recomputes shingle generation twice),
    * and the join key is xxhash64(shingle): an 8-byte key instead of a
    * ~15-byte string, with collision probability ~n²/2⁶⁴ ≈ 10⁻¹¹ at any
    * realistic shingle cardinality.
    */
  def similarPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n)
    val ex0 = sets.select(col(idCol).as("id"), col("n_sh"), explode(col("shingles")).as("sh0"))
      .select(col("id"), col("n_sh"), xxhash64(col("sh0")).as("sh"))
    val exUncached = maxDocFreq match {
      case Some(cap) =>
        // Drop stop-shingles: document frequency above the cap.
        val freq = ex0.groupBy("sh").count().filter(col("count") <= cap).select("sh")
        ex0.join(freq, "sh")
      case None => ex0
    }
    val ex = exUncached.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = ex.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("sh"))
    val b = ex.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("c"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("n_a") + col("n_b") - col("c")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
