package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitter sketch over a string column
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS'12).
  *
  * Buffer: at most `capacity` (item → counter) entries. Update is the
  * classic decrement step; merge adds counters then subtracts the
  * (capacity+1)-th largest to restore the size bound. Guarantees after
  * any combination of updates and merges over N total rows:
  *
  *   - every item with true count > N / (capacity+1) is PRESENT, and
  *   - each kept counter underestimates its true count by at most
  *     N / (capacity+1).
  *
  * So the sketch yields a small CANDIDATE set that provably contains
  * all heavy hitters; an exact second scan over the candidates
  * ([[graft.text.Corpus.topKTokens]]) turns that into exact top-k with
  * two passes and O(capacity) state per partition — the 100 TB shape
  * where a plain groupBy's key cardinality (full vocabulary) would be
  * the bottleneck and `approx_count_distinct`-style sketches answer the
  * wrong question.
  */
case class FreqSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String buffers are reused by columnar readers — copy out
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < capacity => buf(s) = 1L
        case None =>
          // decrement step: one shared occurrence of every tracked item
          // "cancels" this untracked one; drop exhausted counters
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace { (k, c) => if (c == 1L) { dead += k; 0L } else c - 1 }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a(k) = a.getOrElse(k, 0L) + c }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything:
      // exactly capacity entries stay positive (modulo ties at the
      // pivot, which drop too — the underestimate bound still holds)
      val pivot = a.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace { (k, c) => if (c - pivot <= 0L) { dead += k; 0L } else c - pivot }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val (ks, vs) = buf.toArray.sortBy(_._1).unzip
    new ArrayBasedMapData(
      new GenericArrayData(ks.map(k => UTF8String.fromString(k).asInstanceOf[Any])),
      new GenericArrayData(vs.map(_.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, c) => (k.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(12 + _._1.length).sum)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) => bb.putInt(kb.length); bb.put(kb); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf(new String(kb, StandardCharsets.UTF_8)) = bb.getLong
      i += 1
    }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(off: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "freq_sketch"
}

object FreqSketchAgg {
  def freqSketch(c: Column, capacity: Int): Column =
    GraftShims.column(FreqSketchAgg(GraftShims.expression(c), capacity)
      .toAggregateExpression())
}
