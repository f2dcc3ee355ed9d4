package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's internal bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime bloom-filter join pruning, not exposed in the public
  * function registry). Both are codegen-backed Catalyst expressions, so
  * a membership pre-filter built from them stays inside whole-stage
  * codegen — no UDF, no serialization wall.
  *
  * The aggregate's child must be a LONG (hash the value first, e.g.
  * `xxhash64`); `mightContain` probes with the same hash. The filter is
  * approximate in ONE direction only: false positives possible, false
  * negatives never — callers confirm positives exactly and may rely on
  * negatives absolutely.
  */
object Bloom {

  /** Aggregate a column of int64 hashes into one serialized bloom filter
    * (binary). Size it explicitly: `numBits ≈ 16 × estimatedItems` gives
    * ~0.04% false positives — at 16 bits/item a 10M-shingle benchmark
    * suite is a 20 MB filter, broadcastable where the string set is not.
    */
  def bloomFilterAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    GraftShims.column(new BloomFilterAggregate(GraftShims.expression(hashed),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of an int64 hash against a driver-held serialized
    * filter; the filter rides the plan as a binary literal (one copy per
    * executor via the task broadcast, like any literal).
    */
  def mightContain(bf: Array[Byte], hashed: Column): Column =
    GraftShims.column(BloomFilterMightContain(Literal(bf),
      GraftShims.expression(hashed)))
}
