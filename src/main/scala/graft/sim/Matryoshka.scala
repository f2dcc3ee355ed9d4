package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Matryoshka (MRL) two-stage retrieval — the modern embedding-side
  * twin of [[ScalarQuant]]'s memory/recall rung: models trained with
  * matryoshka representation learning (Kusupati et al. 2022) pack
  * coarse semantics into the leading dimensions, so the first `dPrefix`
  * components alone rank candidates well. Stage 1 scans ONLY the
  * prefix (a dPrefix/d fraction of the bytes — at deployment scale,
  * store the prefix as its own column/table so the scan never touches
  * the tail), stage 2 rescores the per-query over-fetched shortlist
  * with exact full-dimension cosine.
  *
  * Every step is deterministic per-element arithmetic (same fold order
  * both engines), so unlike trained quantizers this approximate path is
  * fully oracle-replayable: the coarse ranking, the cut, and the exact
  * re-rank all hash-match.
  */
object Matryoshka {

  /** Top-k cosine through the prefix scan: rank all pairs by cosine
    * over the first `dPrefix` dims (prefix norms, not full norms —
    * a true truncated-embedding search), keep `k·overFetch` per query,
    * exact-rescore only those. Zero-prefix vectors score 0 in stage 1
    * and can only re-enter through the over-fetch window.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, dPrefix: Int, k: Int, overFetch: Int = 4,
           simDigits: Int = 4): DataFrame = {
    require(dPrefix >= 1, s"need dPrefix >= 1, got $dPrefix")
    require(k >= 1 && overFetch >= 1, "need k, overFetch >= 1")
    def side(df: DataFrame, p: String) = {
      val v = transform(col(vecCol), _.cast("double"))
      val pre = slice(v, 1, dPrefix)
      df.select(col(idCol).as(s"${p}_id"),
        v.as(s"__${p}v"), pre.as(s"__${p}p"),
        sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x)).as(s"__${p}n"),
        sqrt(aggregate(pre, lit(0.0), (a, x) => a + x * x)).as(s"__${p}pn"))
    }
    val c = side(corpus, "neighbor")
    val q = side(queries, "query")
    val denom = col("__querypn") * col("__neighborpn")
    // rounded BEFORE the cut (the q37 discipline): the over-fetch set
    // must be identical across engines, and a raw-double ranking can
    // diverge in the last ulps
    val coarse = roundStable(when(denom > 0,
      Similarity.dot(col("__queryp"), col("__neighborp")) / denom)
      .otherwise(lit(0.0)), 6)
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("__coarse").desc, col("neighbor_id"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("__coarse", coarse)
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
