package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** KLL quantile sketch over a double column as a typed aggregate,
  * emitting the serialized sketch blob — the QUANTILE member of the
  * mergeable-sketch family (HLL distinct, theta sets, Count-Min
  * frequency, Misra-Gries heavy hitters, bloom membership): "what is
  * the p99 of any later time range" answered by merging per-window
  * blobs, never by rescanning raw values.
  *
  * Exactness regime (the theta/Misra-Gries discipline): a KLL sketch
  * retains EVERY update until its level-0 buffer capacity `k` is
  * exceeded — below that, no compaction has happened, the sketch IS
  * the sorted data, and every inclusive-rank quantile equals the exact
  * order statistic (DuckDB-oracle-gateable at test SF with k sized
  * above the per-group count). Beyond capacity the published KLL
  * bound applies (~1.65% rank error at k=200, 99% confidence;
  * compaction uses random sampling, so estimates in that regime are
  * NOT run-deterministic — spec'd by tolerance, never by hash).
  * Mergeable by construction: merge(blob_a, blob_b) carries the same
  * rank-error contract as a sketch built over the combined stream,
  * which is what Spark's partial aggregation and any later window
  * rollup both ride (Karnin, Lang, Liberty 2016).
  */
case class KllDoublesSketchAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = createAggregationBuffer()
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesSketchAgg =
    copy(child = newChild)
}
