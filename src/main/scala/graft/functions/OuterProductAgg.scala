package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass outer-product-sum aggregate: for row vectors x (len dx) and
  * y (len dy), accumulates `S[i·dy + j] = Σ_rows x_i · y_j` into ONE
  * primitive d² buffer — the scatter / cross-covariance builder behind
  * PC1 power iteration ([[graft.sim.Geometry.pc1Fit]]) and orthogonal
  * Procrustes ([[graft.sim.Procrustes.fitW]]).
  *
  * Why an aggregate (the [[MinHashSigAgg]] shape): the double-posexplode
  * formulation materializes n·d² intermediate rows BEFORE partial
  * aggregation — at production embedding dims (d = 768–4096) that is
  * 10⁵–10⁷ rows per input row feeding the shuffle, the one explode no
  * map-side combine makes cheap. Here each input row does d² fused
  * multiply-adds into a partition-local buffer and the shuffle carries
  * exactly one d²-double buffer per partition: the map-side-combine
  * ideal, O(partitions·d²) network instead of O(n·d²) rows.
  *
  * Inputs must be `array<double>` (cast upstream); rows where either
  * side is NULL are skipped. Vector width is locked by the first row a
  * partition sees — a mismatched row throws (silent truncation would
  * corrupt the scatter). Empty input evals to NULL.
  *
  * Determinism: per-partition accumulation in row order, merge in task
  * order — fp-order-dependent in the last ulps exactly like the SQL
  * `sum()` it replaces; consumers round (the PC1/Procrustes contract).
  */
case class OuterProductAgg(
    x: Expression,
    y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  // buffer layout: [dx, dy, S_00, S_01, …] — dims ride along so merge and
  // eval need no side channel; Array.empty = "no rows seen yet"
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv == null || yv == null) return buf
    val xa = xv.asInstanceOf[ArrayData]
    val ya = yv.asInstanceOf[ArrayData]
    val dx = xa.numElements()
    val dy = ya.numElements()
    val b =
      if (buf.isEmpty) {
        val nb = new Array[Double](2 + dx * dy)
        nb(0) = dx.toDouble; nb(1) = dy.toDouble
        nb
      } else {
        require(buf(0).toInt == dx && buf(1).toInt == dy,
          s"outer_product_sum: vector width changed mid-corpus — " +
            s"expected ${buf(0).toInt}x${buf(1).toInt}, got ${dx}x$dy")
        buf
      }
    var i = 0
    while (i < dx) {
      val xi = xa.getDouble(i)
      if (xi != 0.0) {
        val base = 2 + i * dy
        var j = 0
        while (j < dy) { b(base + j) += xi * ya.getDouble(j); j += 1 }
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a(0) == b(0) && a(1) == b(1),
        "outer_product_sum: merging buffers of different vector widths")
      var i = 2
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(java.util.Arrays.copyOfRange(buf, 2, buf.length))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(x, y)
  override def withNewMutableAggBufferOffset(off: Int): OuterProductAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): OuterProductAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(x = c(0), y = c(1))
  override def prettyName: String = "outer_product_sum"
}

object OuterProductAgg {
  /** Σ over rows of x ⊗ y, flattened row-major (length dx·dy). */
  def outerProductSum(x: Column, y: Column): Column =
    GraftShims.column(OuterProductAgg(GraftShims.expression(x),
      GraftShims.expression(y)).toAggregateExpression())
}

/** Elementwise vector-sum aggregate (`Σ_rows x`, array<double> → same
  * width) — the O(d)-buffer companion to [[OuterProductAgg]] for the
  * mean term of a covariance: one pass, one buffer, no posexplode.
  * NULL rows skipped; width locked by the first row; empty input → NULL.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val xa = v.asInstanceOf[ArrayData]
    val d = xa.numElements()
    val b =
      if (buf.isEmpty) new Array[Double](d)
      else {
        require(buf.length == d,
          s"vec_sum: vector width changed mid-corpus — expected ${buf.length}, got $d")
        buf
      }
    var i = 0
    while (i < d) { b(i) += xa.getDouble(i); i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, "vec_sum: merging different widths")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(off: Int): VecSumAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VecSumAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "vec_sum"
}

object VecSumAgg {
  def vecSum(c: Column): Column =
    GraftShims.column(VecSumAgg(GraftShims.expression(c)).toAggregateExpression())
}
