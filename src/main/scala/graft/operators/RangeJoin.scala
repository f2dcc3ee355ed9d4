package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: points joined to enclosing intervals.
  *
  * Spark plans a bare `l.pt BETWEEN r.lo AND r.hi` join as a
  * BroadcastNestedLoopJoin — every point against every interval, the
  * classic 100 TB cliff. Binning restores an EQUI join: points key by
  * `floor(pt / bin)`, intervals explode to every bin they overlap, the
  * join runs on the bin key, and the exact range predicate filters
  * within the bin. Cost: |points| + |intervals|·(span/bin + 1) keyed
  * rows instead of |points|·|intervals| pairs.
  *
  * Pick `binMicros` near the typical interval span: much smaller bins
  * inflate the interval explode; much larger bins inflate the per-bin
  * candidate set. Both ends inclusive; each matching (point, interval)
  * pair meets in exactly ONE bin (the point's), so no dedup is needed.
  */
object RangeJoin {

  def binned(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    // integer DIV, not Column./ (always fp) — bin ids must be exact.
    // Truncating division is floor for the post-1970 timestamps this
    // targets; pre-epoch points would need a floordiv. The TIMESTAMP
    // cast admits TIMESTAMP_NTZ columns (wall-clock-identical under the
    // session's pinned UTC zone).
    def bin(c: String) = s"unix_micros(CAST($c AS TIMESTAMP)) DIV ${binMicros}L"
    val lb = points.withColumn("__bin", expr(bin(ptCol)))
    // drop degenerate intervals BEFORE the explode: sequence(lo, hi)
    // with lo > hi silently counts DOWN in Spark, which would fabricate
    // bins for a reversed interval instead of matching nothing
    val rb = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        expr(bin(loCol)), expr(bin(hiCol)))))
    lb.join(rb, Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
