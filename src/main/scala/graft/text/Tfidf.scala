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
}
