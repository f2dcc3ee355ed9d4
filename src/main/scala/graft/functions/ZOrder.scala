package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) codes for multi-dimensional data layout — the
  * bit-interleaving behind `OPTIMIZE ZORDER BY` in lakehouse engines:
  * rows close in the code are close in EVERY interleaved dimension, so
  * range-partitioning by the code clusters a d-dimensional box query
  * into few files and parquet min/max pruning does the rest.
  *
  * Pure built-in expressions (shiftright / and / or folds) — codegen'd
  * end to end, no UDF, no custom Expression needed; the interleave of
  * d columns at b bits is d·b three-op terms fused into one
  * WholeStageCodegen stage.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each (non-negative integral)
    * column: bit `i` of column `c` lands at position `i * d + c`. Caller
    * guarantees inputs fit `bits` (use [[bucketize]] for raw columns);
    * `bits * cols.size` must fit a signed long.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"need 1 <= bits and bits*dims <= 63, got bits=$bits dims=${cols.size}")
    val d = cols.size
    cols.zipWithIndex.map { case (c, ci) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + ci)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Equi-width bucket index in [0, 2^bits) for a raw column given its
    * global [min, max] — the normalization step before interleaving.
    * Equi-width (not equi-depth) keeps the map a pure per-row expression;
    * value skew degrades file balance, never correctness, and the range
    * partitioner downstream re-balances row counts anyway.
    */
  def bucketize(c: Column, min: Double, max: Double, bits: Int): Column = {
    val n = 1L << bits
    val span = math.max(max - min, java.lang.Double.MIN_NORMAL)
    least(lit(n - 1), greatest(lit(0L),
      floor((c.cast("double") - min) / span * n).cast("long")))
  }
}
