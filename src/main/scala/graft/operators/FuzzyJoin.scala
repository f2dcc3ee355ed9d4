package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance record linkage: all pairs of distinct strings within
  * Levenshtein distance `maxDist`, via LOSSLESS length-band blocking.
  *
  * A bare `levenshtein(a, b) <= d` self-join is a BroadcastNestedLoopJoin
  * — every string against every string, with an O(len²) predicate in the
  * inner loop. Blocking restores an EQUI join on a key that cannot drop
  * a true match: edit distance ≥ length difference, so a qualifying pair
  * always has `len(b) − len(a) ∈ [0, d]` (orienting a as the shorter
  * side). The short side explodes to the `d+1` candidate lengths
  * `len(a)..len(a)+d`, the long side keys by its exact length, and the
  * banded Levenshtein (`levenshtein(a, b, threshold)` — O(d·len), early
  * exit, codegen'd) verifies within the band. Cost: |bands| equi-join
  * rows instead of n² pairs; each unordered pair meets exactly once
  * (strict length order, ties broken lexicographically).
  *
  * Scale note: length alone is a coarse key — a corpus of uniform-length
  * strings is one giant band (the adversarial case). Real deployments
  * compose it with a second exact blocking key (first token, phonetic
  * code, or an n-gram MinHash band as in [[graft.dedup.MinHashLsh]]);
  * the length band stays as the lossless backbone because any extra key
  * must be replicated in the match CONTRACT, not silently assumed.
  */
object FuzzyJoin {

  /** All unordered pairs of DISTINCT non-null values of `strCol` with
    * `levenshtein ≤ maxDist`, as `(s_a, s_b, dist)` where `s_a` is the
    * shorter (ties: lexicographically smaller) side.
    */
  def fuzzyPairs(strings: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"need maxDist >= 1, got $maxDist")
    val names = strings.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull).distinct()
    val short = names.select(col("s").as("s_a"),
      explode(sequence(length(col("s")), length(col("s")) + maxDist)).as("__lb"))
    val long = names.select(col("s").as("s_b"), length(col("s")).as("__lb"))
    short.join(long, Seq("__lb"))
      .filter(length(col("s_a")) < length(col("s_b")) || col("s_a") < col("s_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("s_a"), col("s_b"), col("dist").cast("long").as("dist"))
  }
}
