package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Sign-bit binary quantization — the 32× compression rung below
  * [[ScalarQuant]]'s int8 (the "binary embeddings" deployed for
  * first-stage retrieval at billion-vector scale): each dimension keeps
  * only its sign, vectors become bit words, and candidate ranking is
  * Hamming distance — `bit_count(a XOR b)`, the cheapest similarity
  * that exists. Over-fetch + exact re-rank restores ranking quality on
  * the shortlist, exactly the [[ScalarQuant.topK]] ladder.
  *
  * Bits pack into 32-bit words held in longs (NOT one 64-bit word: the
  * oracle engine's BIGINT arithmetic is overflow-checked, and the
  * word-building fold `acc·2 + bit` would trap on a set sign bit; two
  * half-words keep every intermediate exact on both engines). The fold
  * `acc·2 + bit` equals `Σ bit_i·2^(w−i)` in exact integer arithmetic,
  * so packing, XOR, and popcount all hash-match an oracle replay —
  * unlike trained quantizers, this approximate path is fully
  * oracle-checkable.
  */
object BinaryQuant {
  private val WordBits = 32

  /** Pack the sign bits of `vecCol` (length must be a multiple of 32)
    * into an array of 32-bit words; `x > 0` maps to 1. */
  private[sim] def packWords(vecCol: Column, dims: Int): Column = {
    require(dims % WordBits == 0, s"dims must be a multiple of $WordBits")
    transform(sequence(lit(0), lit(dims / WordBits - 1)), w =>
      aggregate(slice(vecCol, w * WordBits + 1, lit(WordBits)), lit(0L),
        (acc, x) => acc * 2 + when(x > 0, 1L).otherwise(0L)))
  }

  /** (id, words) — the persisted 32×-compressed scan layout. */
  def quantize(embs: DataFrame, idCol: String, vecCol: String,
               dims: Int): DataFrame =
    embs.select(col(idCol), packWords(col(vecCol), dims).as("words"))

  /** Top-k cosine through the binary scan: rank all pairs by Hamming
    * distance over the packed words (asc — fewer sign disagreements ≈
    * higher cosine for mean-centered embeddings), keep `k·overFetch`
    * per query, exact-rescore the shortlist on the float vectors.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, dims: Int, k: Int, overFetch: Int = 4,
           simDigits: Int = 4): DataFrame = {
    require(k >= 1 && overFetch >= 1, "need k, overFetch >= 1")
    def side(df: DataFrame, p: String) = {
      val v = transform(col(vecCol), _.cast("double"))
      df.select(col(idCol).as(s"${p}_id"), v.as(s"__${p}v"),
        sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x)).as(s"__${p}n"),
        packWords(col(vecCol), dims).as(s"__${p}w"))
    }
    val c = side(corpus, "neighbor")
    val q = side(queries, "query")
    val hamming = aggregate(
      zip_with(col("__queryw"), col("__neighborw"),
        (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("__ham").asc, col("neighbor_id"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("__ham", hamming)
      .withColumn("__arank", row_number().over(wa))
      .filter(col("__arank") <= k * overFetch)
      .withColumn("cosine", roundStable(
        Similarity.dot(col("__queryv"), col("__neighborv")) /
          (col("__queryn") * col("__neighborn")), simDigits))
      .withColumn("rank", row_number().over(we).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("__ham").as("hamming"),
        col("cosine"), col("rank"))
  }
}
