package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Degree assortativity coefficient (Newman 2002, the graph-census
  * scalar next to clustering coefficient and modularity): the Pearson
  * correlation of endpoint degrees over all edges — positive means
  * hubs attach to hubs (social nets), negative means hubs attach to
  * leaves (the hub-and-spoke shape that decides whether the C47/C64
  * iterative ops face skew). One number that says whether `saltBuckets`
  * will matter BEFORE you run ten PageRank rounds.
  *
  * Shape: one degree aggregation (O(#nodes)), two keyed joins to
  * decorate each edge with endpoint degrees, one closing global moment
  * agg — the explicit shared-moment Pearson (the rollingCorr ANSI
  * lesson), NULL when degrees are constant (a regular graph has no
  * degree correlation to measure). Feed symmetrized edges for the
  * undirected convention (each edge counted in both orientations, as
  * Newman's formula expects).
  */
object Assortativity {

  def degreeAssortativity(edges: DataFrame, srcCol: String, dstCol: String,
                          digits: Int = 6): DataFrame = {
    val deg = edges.groupBy(col(srcCol).as("__node"))
      .agg(count(lit(1)).as("__deg"))
    val decorated = edges
      .join(deg.select(col("__node").as(srcCol), col("__deg").as("__dj")),
        Seq(srcCol))
      .join(deg.select(col("__node").as(dstCol), col("__deg").as("__dk")),
        Seq(dstCol))
    val n = count(lit(1)).cast("double")
    val x = col("__dj").cast("double"); val y = col("__dk").cast("double")
    val sx = sum(x); val sy = sum(y)
    val sxy = sum(x * y); val sxx = sum(x * x); val syy = sum(y * y)
    val den = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    decorated.agg(
      roundStable(when(den > 0, (n * sxy - sx * sy) / den), digits)
        .as("assortativity"),
      count(lit(1)).as("n_edges"))
  }
}
