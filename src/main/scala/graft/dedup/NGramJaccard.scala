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
  * rows); `maxDocFreq` drops such stop-shingles from CANDIDATE GENERATION
  * only — candidates are then verified with exact Jaccard on the full
  * shingle sets, so the output is provably unchanged unless a qualifying
  * pair shares *zero* sub-cap shingles. A pair at jaccard ≥ t has at
  * least t/(1+t)·(|A|+|B|) common shingles; for the cap to lose it,
  * every single one must occur in more than `maxDocFreq` documents —
  * i.e. the pair would have to be built entirely of boilerplate, which
  * is exactly the content near-dup dedup intends to ignore.
  *
  * This exact operator doubles as the correctness oracle for the
  * probabilistic [[MinHashLsh]] path.
  */
object NGramJaccard {

  /** (id, shingles, n) where shingles is the distinct word-n-gram set.
    * Documents with fewer than `n` tokens get an EMPTY set (matching the
    * oracle's `range()` semantics) — without the guard, `sequence(1, k)`
    * with k <= 0 counts DOWN and the slice throws at runtime.
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    df.select(
        col(idCol),
        when(size(words) >= n,
          array_distinct(
            transform(
              sequence(lit(1), size(words) - (n - 1)),
              i => concat_ws(" ", slice(words, i, lit(n))))))
          .otherwise(array().cast("array<string>"))
          .as("shingles"))
      .withColumn("n_sh", size(col("shingles")).cast("long"))
  }

  /** Exact Jaccard verification of candidate (id_a, id_b) pairs against
    * the full shingle sets. Shared by the capped path here and by
    * [[MinHashLsh]] — any candidate generator composes with it.
    *
    * Each document's shingle set is hashed + sorted ONCE (per document,
    * before the join); the per-pair work is then a primitive merge scan
    * ([[graft.functions.SortedIntersectCount]]) instead of
    * `array_intersect` hash-set building over strings per pair — the
    * measured dominant cost of the verify join. Hash-collision risk is
    * the same ~n²/2⁶⁴ already accepted by candidate generation.
    */
  private[dedup] def verifyExact(
      cand: DataFrame, sets: DataFrame, idCol: String, minJaccard: Double): DataFrame = {
    val hashed = sets.select(col(idCol), col("n_sh"),
      sort_array(transform(col("shingles"), s => xxhash64(s))).as("shh"))
    val sa = hashed.select(col(idCol).as("id_a"), col("shh").as("shh_a"), col("n_sh").as("n_a"))
    val sb = hashed.select(col(idCol).as("id_b"), col("shh").as("shh_b"), col("n_sh").as("n_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("c",
        graft.functions.SetExpressions.sortedIntersectCount(col("shh_a"), col("shh_b")))
      .withColumn("jaccard",
        col("c").cast("double") / (col("n_a") + col("n_b") - col("c")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Near-duplicate pairs (id_a < id_b) with exact Jaccard >= minJaccard.
    *
    * The exploded index is persisted (it feeds both sides of the
    * self-join — without this Spark recomputes shingle generation twice),
    * and the join key is xxhash64(shingle): an 8-byte key instead of a
    * ~15-byte string, with collision probability ~n²/2⁶⁴ ≈ 10⁻¹¹ at any
    * realistic shingle cardinality.
    *
    * Cache lifecycle: the (small) pair result is materialized with
    * `localCheckpoint` before returning and the intermediate caches are
    * unpersisted — a long-lived session running many queries doesn't
    * accumulate evicting cached blocks.
    */
  def similarPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    maxDocFreq match {
      case None =>
        // Pure exact path: jaccard from co-occurrence counts directly.
        val sets = shingleSets(df, idCol, textCol, n)
        val ex = sets
          .select(col(idCol).as("id"), col("n_sh"), explode(col("shingles")).as("sh0"))
          .select(col("id"), col("n_sh"), xxhash64(col("sh0")).as("sh"))
          .persist(level)
        val a = ex.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("sh"))
        val b = ex.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("sh"))
        val out = a.join(b, Seq("sh"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("c"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
          .withColumn("jaccard",
            col("c").cast("double") / (col("n_a") + col("n_b") - col("c")).cast("double"))
          .filter(col("jaccard") >= minJaccard)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .localCheckpoint()
        ex.unpersist()
        out
      case Some(cap) =>
        // Scale path: stop-shingles (doc freq > cap) are dropped from the
        // candidate index — bounding the f² pair blowup — and candidates
        // are re-scored exactly on the FULL sets, so the cap affects cost,
        // not (for any pair sharing >= 1 sub-cap shingle) results.
        val sets = shingleSets(df, idCol, textCol, n).persist(level)
        val ex0 = sets
          .select(col(idCol).as("id"), explode(col("shingles")).as("sh0"))
          .select(col("id"), xxhash64(col("sh0")).as("sh"))
        val keep = ex0.groupBy("sh").count().filter(col("count") <= cap).select("sh")
        val ex = ex0.join(keep, "sh").persist(level)
        val cand = ex.select(col("id").as("id_a"), col("sh"))
          .join(ex.select(col("id").as("id_b"), col("sh")), Seq("sh"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
          .distinct()
        val out = verifyExact(cand, sets, idCol, minJaccard).localCheckpoint()
        ex.unpersist()
        sets.unpersist()
        out
    }
  }
}
