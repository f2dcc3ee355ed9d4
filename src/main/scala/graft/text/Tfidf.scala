package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus.
  *
  * tf(d,t) · ln(N / df(t)) with all math in double. Three keyed
  * aggregations: (doc,term) counts, term document-frequency, corpus size
  * — df and N are tiny relative to the corpus and broadcast back, so the
  * only big shuffle is the (doc,term) groupBy.
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
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }
}
