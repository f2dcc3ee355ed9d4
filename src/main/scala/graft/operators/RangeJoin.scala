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

  /** Numeric BAND join: every (left, right) pair with
    * `|leftVal − rightVal| ≤ eps` — near-price reconciliation,
    * duplicate-payment detection, tolerance matching between systems.
    * The numeric sibling of [[binned]]: a bare `abs(a−b) <= eps` join
    * is a nested loop; here the left keys by its `eps`-width cell and
    * the right explodes to its cell ± 1 (any in-band partner's cell is
    * within one of its own), so the join is EQUI on the cell with the
    * exact band filter inside. Each qualifying pair meets EXACTLY once
    * (the left row's cell is unique) — no dedup shuffle. Cells come
    * from int64 `floor(v/eps)` on values scaled by `scale` (pass the
    * value's native precision, e.g. 100 for cents) so cell ids are
    * exact integer arithmetic, never fp-boundary-dependent.
    */
  def band(left: DataFrame, right: DataFrame,
           leftValCol: String, rightValCol: String,
           eps: Double, scale: Long): DataFrame = {
    require(eps > 0, s"need eps > 0, got $eps")
    require(scale > 0, s"need scale > 0, got $scale")
    val epsI = math.round(eps * scale)
    require(epsI > 0, "eps must be representable at the given scale")
    // uniform +1e15 shift before the DIV: truncating division is only
    // floor for nonnegative operands, and a negative value straddling
    // cell 0 would otherwise land one cell high and MISS its partners
    def cellOf(c: String) =
      expr(s"(CAST(round($c * $scale) AS BIGINT) + 1000000000000000L)" +
        s" DIV ${epsI}L")
    val lb = left.withColumn("__cell", cellOf(leftValCol))
    val rb = right
      .withColumn("__rc", cellOf(rightValCol))
      .withColumn("__cell",
        explode(array(col("__rc") - 1, col("__rc"), col("__rc") + 1)))
      .drop("__rc")
    lb.join(rb, Seq("__cell"))
      .filter(abs(expr(s"CAST(round($leftValCol * $scale) AS BIGINT)") -
        expr(s"CAST(round($rightValCol * $scale) AS BIGINT)")) <= epsI)
      .drop("__cell")
  }
}
