package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Label-centroid diagnostics over an embedding corpus — the embedding
  * NEIGHBORHOOD's answer to "which classes does this space confuse":
  * per-label mean vectors and their pairwise cosines. High centroid
  * cosine between two labels predicts exactly where C8/C49 retrieval
  * mixes them up and where [[Similarity.hardNegatives]] finds its
  * hardest pairs — the 45-number summary you read before burning a
  * full eval.
  *
  * Everything stays in LONG form — (label, dim, value) rows through
  * keyed aggregations — never rebuilding arrays: centroids are one
  * (label, dim) mean, norms one label agg, pair cosines one dim-keyed
  * join over the O(#labels·#dims) centroid rows. Corpus-size work is
  * exactly one explode + one aggregation; everything after is
  * label-count-sized. Centroid means are ROUNDED (9dp) before the
  * cosine so both engines feed identical inputs to the pair stage (the
  * cross-engine ulp rule for derived floats).
  */
object Centroids {

  /** (label, dim, mu, n) — the per-label mean vector in long form. */
  def labelCentroids(df: DataFrame, vecCol: String,
                     labelCol: String): DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy(col("label"), col("dim"))
      .agg(roundStable(avg(col("__v").cast("double")), 9).as("mu"),
        count(lit(1)).as("n"))

  /** (label_a < label_b, cosine) over the label centroids. */
  def centroidConfusion(df: DataFrame, vecCol: String, labelCol: String,
                        digits: Int = 6): DataFrame = {
    val c = labelCentroids(df, vecCol, labelCol)
      .select(col("label"), col("dim"), col("mu"))
    val n = c.groupBy(col("label"))
      .agg(sum(col("mu") * col("mu")).as("__nn"))
    val pairs = c.as("a")
      .join(c.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.mu") * col("b.mu")).as("__dot"))
    pairs
      .join(n.select(col("label").as("label_a"), col("__nn").as("__na")),
        "label_a")
      .join(n.select(col("label").as("label_b"), col("__nn").as("__nb")),
        "label_b")
      .select(col("label_a"), col("label_b"),
        roundStable(col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb"))),
          digits).as("cosine"))
  }
}
