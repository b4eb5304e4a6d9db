package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType}

/** Misra-Gries frequent-items sketch as a typed aggregate: a mergeable
  * bounded summary (≤ `capacity` counters) of a long key stream with the
  * classic deterministic guarantee — every reported count is within
  * n/capacity of the true count, and every key with true count >
  * n/capacity is present. The mergeable form (sum counters, then cut
  * back to capacity by subtracting the (capacity+1)-th largest count —
  * Agarwal et al., "Mergeable Summaries") keeps the guarantee under
  * Spark's partial aggregation: map-side sketches combine per partition,
  * one capacity-bounded map crosses the shuffle per group — CONSTANT
  * state per group regardless of key cardinality, the frequent-items
  * twin of HLL distinct-count and t-digest quantiles.
  */
case class FreqSketchAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  type Buf = scala.collection.mutable.LongMap[Long]

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.LongMap.empty[Long]

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val cur = buf.getOrElse(key, -1L) // counters are ≥ 1; -1 = absent
      if (cur > 0L) buf.update(key, cur + 1L)
      else if (buf.size < capacity) buf.update(key, 1L)
      else {
        // decrement-all step: every stored counter pays 1 for the
        // unstored arrival (amortized O(1) — each decrement is funded
        // by a previous increment); zeros drop, freeing slots
        val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (k, c) => if (c == 1L) dead += k else buf.update(k, c - 1L) }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreachEntry { (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      // cut back: subtract the (capacity+1)-th largest count, drop ≤ 0
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
      b1.foreachEntry { (k, c) => if (c - cut <= 0L) dead += k else b1.update(k, c - cut) }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val entries = buf.toSeq.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}
