package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Per-vector symmetric int8 scalar quantization — the 4× embedding
  * compression that turns a 100 TB float corpus into a 25 TB scan:
  * `scale = 127 / max|x_i|`, `code_i = round(x_i · scale)` (round half
  * up via `floor(x·scale + 0.5)`, the engine-portable form — every step
  * is deterministic per-element arithmetic, so the oracle replays it
  * bit-identically). The stored layout per vector is `codes` (int8-range
  * ints), `scale`, and the original L2 `nrm` — everything a cosine
  * search needs without touching the floats.
  *
  * Simpler and weaker than [[ProductQuantizer]] (4× vs 32× compression,
  * but no codebook training, exact per-element error bound ≤ 0.5/scale)
  * — the standard first rung of the memory/recall ladder.
  */
object ScalarQuant {

  /** (scale, nrm, codes) expressions over a vector column. */
  private def quantCols(vecCol: String): (Column, Column, Column) = {
    val v = transform(col(vecCol), _.cast("double"))
    val mx = array_max(transform(v, abs(_)))
    val scale = when(mx > 0, lit(127.0) / mx).otherwise(lit(0.0))
    (scale,
      sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x)),
      transform(v, x => floor(x * scale + lit(0.5)).cast("int")))
  }

  /** Quantize `vecCol` to `(scale, nrm, codes)` per id — the persisted
    * compressed layout. An all-zero vector gets `scale = 0` and all-zero
    * codes (nothing to scale).
    */
  def quantize(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (scale, nrm, codes) = quantCols(vecCol)
    embs.select(col(idCol), scale.as("scale"), nrm.as("nrm"),
      codes.as("codes"))
  }

  /** Top-k cosine neighbors through the quantized scan: rank ALL pairs
    * by the int8 approximation `⟨codes_q, codes_c⟩ / (scale_q·scale_c·
    * nrm_q·nrm_c)` (integer dot — exact in doubles since |code| ≤ 127),
    * keep `k·overFetch` candidates per query, then rescore ONLY those
    * exactly on the float vectors. Ranking inversions beyond the
    * over-fetch horizon are the (spec-measured) recall cost; inside it
    * the final order is exact-cosine, so ties and ranks stay
    * deterministic (rounded sim + id tie-break, the oracle discipline).
    *
    * Scale shape: the pair scan needs codes+two scalars per vector (4×
    * lighter than floats — at deployment scale persist [[quantize]]'s
    * output as the scan table and join the float column back for the
    * candidate sliver only); queries are broadcast; the candidate cut is
    * a per-query window (keyed by query id, never a global sort).
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, k: Int, overFetch: Int = 4,
           simDigits: Int = 4): DataFrame = {
    require(k >= 1 && overFetch >= 1, s"need k, overFetch >= 1")
    def side(df: DataFrame, p: String) = {
      val (scale, nrm, codes) = quantCols(vecCol)
      df.select(col(idCol).as(s"${p}_id"), scale.as(s"__${p}s"),
        nrm.as(s"__${p}n"), col(vecCol).as(s"__${p}v"),
        transform(codes, _.cast("double")).as(s"__${p}c"))
    }
    val c = side(corpus, "neighbor")
    val q = side(queries, "query")
    val approx = Similarity.dot(col("__queryc"), col("__neighborc")) /
      (col("__querys") * col("__neighbors") * col("__queryn") * col("__neighborn"))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("__approx").desc, col("neighbor_id"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("__approx", approx)
      .withColumn("__arank", row_number().over(wa))
      .filter(col("__arank") <= k * overFetch)
      .withColumn("cosine", roundStable(
        Similarity.dot(col("__queryv"), col("__neighborv")) /
          (col("__queryn") * col("__neighborn")), simDigits))
      .withColumn("rank", row_number().over(we).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
