package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bridge over the engine's internal runtime-bloom-filter expressions —
  * the same machinery Catalyst's InjectRuntimeFilter rule plants on join
  * fact sides, exposed for EXPLICIT membership state:
  *
  *  - [[bloomAgg]] is a mergeable TypedImperativeAggregate: map-side
  *    partial filters OR together (bit-union is order-independent, so
  *    the serialized result is deterministic for a given input SET
  *    whatever the partitioning), one bounded binary blob crosses the
  *    shuffle.
  *  - [[mightContain]] embeds the materialized filter as a plan-time
  *    literal (exactly how the runtime-filter framework ships its
  *    subquery result) and evaluates membership in codegen — no UDF
  *    boxing, no per-row deserialization (the filter deserializes once
  *    per task).
  *
  * Reusing the engine's own expressions instead of hand-rolling a
  * sketch keeps the scale contract (bounded state, partial aggregation)
  * and inherits its tested serialization format.
  */
object BloomBridge {

  /** One-column bloom-filter aggregate over LONG inputs (hash upstream
    * with xxhash64). `estimatedItems` sizes the filter via the session's
    * runtime-filter defaults (numBits capped by
    * spark.sql.optimizer.runtime.bloomFilter.maxNumBits).
    */
  def bloomAgg(c: Column, estimatedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(c), estimatedItems)
        .toAggregateExpression())

  /** Codegen'd membership probe of a materialized filter. One-sided
    * error: true may be a false positive (rate set by the build sizing),
    * false is certain.
    */
  def mightContain(filterBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType), ColumnBridge.expression(c)))
}
