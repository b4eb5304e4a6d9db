package org.apache.spark.sql.graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Theta sketch over a long key column as a typed aggregate, emitting
  * the COMPACT SKETCH BLOB (sketch-as-data, like the HLL daily rollup)
  * — the distinct-count summary that, unlike HLL, supports SET
  * OPERATIONS: two blobs intersect/difference downstream at constant
  * cost, which is what audience-overlap questions need at cardinalities
  * where exact distinct-(user, type) joins stop being an option.
  *
  * Exactness regime (the Misra-Gries discipline): a theta sketch stores
  * EVERY distinct hash until it exceeds its nominal capacity 2^lgK —
  * below that threshold theta = 1 and estimates (including those of
  * downstream intersections) are EXACT, so the operator gates against
  * the DuckDB oracle at test SF with capacity sized above the data, and
  * keeps the ~1/√(2^lgK) relative-error contract beyond. Mergeable by
  * construction (Union of compact blobs) — Spark's partial aggregation
  * and any later rollup both ride that.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 14,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}
