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
    // per-row shingle building (split + transform + distinct + hash +
    // sort) is the compute-heavy stage — spread an under-parallel scan
    // first (guide §2.2; a single-row-group file is ONE task otherwise)
    graft.Tables.spread(df, idCol).select(
        col(idCol),
        when(size(words) >= n,
          array_distinct(
            transform(
              sequence(lit(1), size(words) - (n - 1)),
              i => concat_ws(" ", slice(words, i, lit(n))))))
          .otherwise(array().cast("array<string>"))
          .as("shingles"))
      .withColumn("n_sh", size(col("shingles")).cast("long"))
      // globally-sorted 64-bit shingle hashes, computed once per doc:
      // the prefix-filter index and the merge-scan verification both
      // read this representation
      .withColumn("shh", sort_array(transform(col("shingles"), s => xxhash64(s))))
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
    val sa = sets.select(col(idCol).as("id_a"), col("shh").as("shh_a"), col("n_sh").as("n_a"))
    val sb = sets.select(col(idCol).as("id_b"), col("shh").as("shh_b"), col("n_sh").as("n_b"))
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
    // the raw string-shingle array is never read past this point (index
    // and verify both ride the hashed+sorted `shh`) — dropping it before
    // the persist halves the cached bytes and the per-scan decode cost
    val sets = shingleSets(df, idCol, textCol, n)
      .drop("shingles").persist(level)

    // PPJoin-style prefix filtering: under ANY global element order, a
    // pair with jaccard >= t must share an element among the first
    // |d| − ⌈t·|d|⌉ + 1 entries of each sorted set — so only that prefix
    // needs indexing, shrinking the self-join quadratically in the
    // prefix ratio (t=0.8 → ~20% of the index → ~4% of the pairs). The
    // epsilon biases ⌈⌉ DOWN on fp error: the prefix can only come out
    // LONGER than required, never shorter (which would lose pairs).
    val p = (col("n_sh") - ceil(col("n_sh") * minJaccard - lit(1e-9)) + 1).cast("int")
    val pref = sets.select(col(idCol).as("id"), explode(slice(col("shh"), lit(1), p)).as("sh"))
    val idx = maxDocFreq match {
      case Some(cap) =>
        // optional stop-shingle cap on top (document frequency measured
        // on the FULL sets): bounds the f² blowup on boilerplate; can
        // only lose a pair whose EVERY shared prefix shingle is capped
        val keep = sets.select(explode(col("shh")).as("sh"))
          .groupBy("sh").count().filter(col("count") <= cap).select("sh")
        pref.join(keep, "sh")
      case None => pref
    }
    val ix = idx.persist(level)
    val cand = ix.select(col("id").as("id_a"), col("sh"))
      .join(ix.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // exact merge-scan verification restores exactness of the filtered
    // candidate generation
    val out = verifyExact(cand, sets, idCol, minJaccard).localCheckpoint()
    ix.unpersist()
    sets.unpersist()
    out
  }

  /** Asymmetric containment pairs: |A ∩ B| / min(|A|, |B|) ≥ t — the
    * quote/inclusion detector Jaccard structurally misses (a paragraph
    * embedded verbatim in a 100× longer page has tiny Jaccard but
    * containment ≈ 1; the training-data failure mode is boilerplate
    * pages each "containing" a popular snippet). Output keeps both
    * directionality hints (set sizes) so the caller can drop the
    * contained side.
    *
    * Candidates come from the shared-shingle inverted index under a
    * document-frequency cap — PPJoin prefix filtering does NOT apply
    * here (its prefix length is derived from the Jaccard bound; a
    * containment pair's required overlap scales with the SMALLER set,
    * which the larger side's prefix cannot bound), so the cap is the
    * scale control: boilerplate stop-shingles are excluded from
    * candidate generation only, and the exact merge-scan verify keeps
    * the output correct for any pair sharing one sub-cap shingle.
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minContainment: Double,
      maxDocFreq: Long = 1000L): DataFrame = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // drop the unused string-shingle array before the persist (see
    // similarPairs)
    val sets = shingleSets(df, idCol, textCol, n)
      .drop("shingles").persist(level)
    val all = sets.select(col(idCol).as("id"), explode(col("shh")).as("sh"))
    val keep = all.groupBy("sh").count()
      .filter(col("count") <= maxDocFreq).select("sh")
    val ix = all.join(keep, "sh").persist(level)
    val cand = ix.select(col("id").as("id_a"), col("sh"))
      .join(ix.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val sa = sets.select(col(idCol).as("id_a"), col("shh").as("shh_a"), col("n_sh").as("n_a"))
    val sb = sets.select(col(idCol).as("id_b"), col("shh").as("shh_b"), col("n_sh").as("n_b"))
    val out = cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("c",
        graft.functions.SetExpressions.sortedIntersectCount(col("shh_a"), col("shh_b")))
      .withColumn("containment",
        col("c").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"), col("containment"))
      .localCheckpoint()
    ix.unpersist()
    sets.unpersist()
    out
  }
}
