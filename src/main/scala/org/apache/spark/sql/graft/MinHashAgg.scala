package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All-permutations MinHash signature as ONE typed aggregate:
  * buffer = Array[Long](nPerm), update folds a hashed shingle through
  * every permutation h_k(x) = (a_k·x + b_k) mod p in a tight primitive
  * loop.
  *
  * WHY this exists: the declarative formulation — nPerm separate
  * `min(pmod(a·h+b, p))` aggregate columns — exceeds
  * spark.sql.codegen.maxFields (100) at nPerm = 128, so whole-stage
  * codegen SILENTLY disables and every row evaluates 128 interpreted
  * expression trees with boxed results. At ~10M shingle rows that is
  * ~10⁹ allocations; measured at sf0.1 the interpreted aggregate spends
  * more time in GC than in useful work and taxes every later query in
  * the session. The typed buffer keeps the whole signature ONE field
  * (plans as ObjectHashAggregate with partial aggregation — the
  * map-side combine and the one nPerm-wide row per doc crossing the
  * shuffle are unchanged), and update/merge are allocation-free.
  *
  * The permutation coefficients are passed in (single source of truth:
  * graft.operators.Dedup.perms) — signatures are bit-identical to the
  * declarative form (EquivalenceSpec proves it).
  */
case class MinHashAgg(
    child: Expression,
    as: Array[Long],
    bs: Array[Long],
    prime: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val n = as.length
  require(bs.length == n, "coefficient arrays must align")

  override def createAggregationBuffer(): Array[Long] = Array.fill(n)(prime)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < n) {
        val m = (as(k) * h + bs(k)) % prime // operands ≥ 0 → % ≡ pmod
        if (m < buf(k)) buf(k) = m
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < n) { if (b2(k) < b1(k)) b1(k) = b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(n * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](n)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
