package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection — the probabilistic
  * scale path whose exact twin is [[NGramJaccard]].
  *
  * Pipeline (all shuffles are keyed; nothing is all-pairs):
  *
  *   shingle sets → explode → 128 universal-hash minima per doc
  *   → 32 bands × 4 rows → band-bucket self-join → candidate pairs
  *   → exact Jaccard verification (array_intersect on the shingle sets)
  *
  * With b=32, r=4: P(candidate | j) = 1 − (1 − j⁴)³²  →  ~0.87 at j=0.5,
  * ~1 − 1e-15 at j=0.9. Exact verification removes all false positives,
  * so the output equals the exact operator's output up to (vanishingly
  * rare) recall misses — which is why the driver oracle for this query
  * can be the exact-Jaccard SQL.
  *
  * Hashing is Spark murmur3 (`hash()`) re-keyed through deterministic
  * affine maps mod a Mersenne prime — fully reproducible, no RNG state.
  */
object MinHashLsh {

  /** doc → minhash signature array (numHashes minima over its shingles),
    * one pass via [[graft.functions.MinHashSigAgg]].
    */
  def signatures(shingleSets: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val ex = shingleSets.select(col(idCol), explode(col("shingles")).as("sh"))
      // murmur3 int → non-negative long
      .withColumn("h", (hash(col("sh")).cast("long") + lit(1L << 31)))
    ex.groupBy(col(idCol))
      .agg(graft.functions.MinHashSigAgg.minhashSig(col("h"), numHashes).as("sig"))
  }

  /** LSH band-bucket rows (id, band, bh) for pre-built shingle sets —
    * the probe/index representation. Per-document and fully
    * deterministic, so rows computed for a DELTA in isolation are
    * byte-identical to the rows the full corpus would produce — which
    * is what makes [[IncrementalDedup]]'s delta-vs-index join exact.
    */
  private[graft] def bandRows(sets: DataFrame, idCol: String,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = signatures(sets, idCol, numHashes)
    // band key: murmur3 over the band's signature slice + band index
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => col("sig").getItem(b * rows + r))
      struct(lit(b).as("band"), hash((lit(b) +: slice): _*).as("bh"))
    }
    sig.select(col(idCol).as("id"),
      explode(array(bandCols: _*)).as("tb"))
      .select(col("id"), col("tb.band").as("band"), col("tb.bh").as("bh"))
  }

  /** The full lazy pipeline over pre-built shingle sets — exposed
    * separately from [[similarPairs]] so the plan-shape regression gate
    * can fingerprint the candidate-generation plan (banded keyed
    * self-join, O(n·bands) rows, never all-pairs) BEFORE the
    * materializing checkpoint hides it behind a LogicalRDD scan.
    */
  private[graft] def pairsPlan(sets: DataFrame, idCol: String, minJaccard: Double,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val banded = bandRows(sets, idCol, numHashes, bands)

    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    NGramJaccard.verifyExact(cand, sets, idCol, minJaccard)
  }

  /** Candidate pairs from banding + exact Jaccard >= minJaccard. */
  def similarPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    // The shingle sets feed three consumers (signatures + both sides of
    // the verification join) — persist once.
    val sets = NGramJaccard.shingleSets(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the (small) verified pair set is materialized so the shingle cache
    // can be released — long-lived sessions don't accumulate cached
    // blocks across queries
    val out = pairsPlan(sets, idCol, minJaccard, numHashes, bands).localCheckpoint()
    sets.unpersist()
    out
  }
}
