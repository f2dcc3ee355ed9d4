package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus.
  *
  * tf(d,t) · ln(N / df(t)) with all math in double. Three keyed
  * aggregations: (doc,term) counts, term document-frequency, corpus size.
  * The term↔df join carries NO static broadcast hint: over a web-scale
  * corpus the vocabulary (typos, URLs, numbers) is itself unbounded, so a
  * forced broadcast would OOM the driver — AQE broadcasts at runtime when
  * df actually fits, and otherwise both sides shuffle on `term`, a
  * partitioning the preceding aggregations already produce.
  */
object Tfidf {

  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // terms is distinct on (id, term), so df(t) = count of rows per term
    val dfreq = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    terms
      .join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Top-`k` highest-TF-IDF terms per document — the keyphrase/tag
    * extraction readout the raw scores exist for (per-doc topical
    * labels, index keys, weak supervision features). Scores are ROUNDED
    * before ranking (cross-engine rank-tie stability — the
    * `graft.etl.Drift.pettitt` rule) with a lexicographic tie-break, so
    * the cut is deterministic and replayable. The per-doc window rides
    * the (doc, term) aggregation's own partitioning; Spark 4 plans the
    * rank filter as WindowGroupLimit — partial top-k per partition
    * before the window sort, never a full per-doc sort of the
    * vocabulary.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int, digits: Int = 6): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("tfidf_r").desc, col("term"))
    scores(docs, idCol, textCol)
      .withColumn("tfidf_r", graft.functions.roundStable(col("tfidf"), digits))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf_r"), col("rank"))
  }
}
