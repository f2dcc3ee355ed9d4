package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.roundStable
import graft.sim.Similarity.dot

/** Two-NN intrinsic-dimension estimate (Facco et al., Scientific
  * Reports 2017): for each sample point, the ratio `μ = r₂/r₁` of its
  * second- to first-nearest-neighbor distances depends ONLY on the
  * manifold's intrinsic dimension d (Pareto with exponent d under
  * local uniformity), giving the MLE `d̂ = n / Σ ln μᵢ`. The embedding
  * diagnostic read before sizing an index or trusting a 64-dim space:
  * if d̂ ≈ 9, IVF cell counts, PQ codebooks, and MRL prefix lengths are
  * all being tuned against 9 effective dimensions, not 64.
  *
  * Shape: exact 2-NN over a deterministic QUERY SAMPLE (the estimator
  * is statistical — a corpus-scale exact all-pairs would buy nothing;
  * swap in the ANN ladder's buckets to scale the neighbor search
  * itself). Euclidean distances from the dot/norm identity
  * `r² = |a|² + |b|² − 2a·b`, ROUNDED (6dp) before ranking (the
  * cross-engine rank rule). Points with r₁ = 0 (exact duplicates)
  * drop with a visible count — ln(μ) is undefined there, and
  * silently keeping them would bias d̂ up.
  */
object IntrinsicDim {

  /** One row: (n_used, n_dropped_dup, sum_ln_mu, id_hat). */
  def twoNN(corpus: DataFrame, queries: DataFrame, idCol: String,
            vecCol: String, distDigits: Int = 6,
            digits: Int = 6): DataFrame = {
    // squared norms via dot(v,v) directly — a sqrt-then-square round
    // trip would differ from the oracle's plain sum-of-squares by ulps
    // and flip rounded-distance ties
    val q = queries.select(col(idCol).as("__qid"), col(vecCol).as("__qv"),
      dot(col(vecCol), col(vecCol)).as("__qn2"))
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
      dot(col(vecCol), col(vecCol)).as("__cn2"))
    val d2 = col("__qn2") + col("__cn2") -
      lit(2.0) * dot(col("__qv"), col("__cv"))
    // clamp tiny negative fp residue before the sqrt
    val dist = roundStable(sqrt(greatest(d2, lit(0.0))), distDigits)
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__d"), col("__cid"))
    val nn = c.join(broadcast(q), col("__qid") =!= col("__cid"))
      .withColumn("__d", dist)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col("__qid"))
      .agg(min(when(col("__rn") === 1, col("__d"))).as("__r1"),
        min(when(col("__rn") === 2, col("__d"))).as("__r2"))
    val scored = nn.withColumn("__lnmu",
      when(col("__r1") > 0, log(col("__r2") / col("__r1"))))
    scored.agg(
      sum(when(col("__lnmu").isNotNull, 1L).otherwise(0L)).as("n_used"),
      sum(when(col("__lnmu").isNull, 1L).otherwise(0L)).as("n_dropped_dup"),
      roundStable(sum(col("__lnmu")), digits).as("sum_ln_mu"),
      roundStable(
        sum(when(col("__lnmu").isNotNull, 1L).otherwise(0L)).cast("double") /
          sum(col("__lnmu")), digits).as("id_hat"))
  }
}
