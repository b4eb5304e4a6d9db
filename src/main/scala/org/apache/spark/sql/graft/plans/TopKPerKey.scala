package org.apache.spark.sql.graft.plans

// Hosted inside the org.apache.spark.sql package tree for access to the
// private[sql] Dataset.ofRows constructor — the standard pattern for
// third-party plan nodes.

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Logical: keep the first `k` rows per key group under `order`.
  *
  * The window-function formulation (`row_number().over(partitionBy…
  * orderBy…) <= k`) must fully sort every key group after the shuffle —
  * O(n log n) per partition in the group size. This operator keeps a
  * bounded heap per key instead: O(n log k) with k ≪ group size, and its
  * partial phase runs BEFORE the shuffle, so at most k rows per (key ×
  * input partition) ever cross the exchange. At 100 TB that is the
  * difference between shuffling the corpus and shuffling k×keys rows.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical: bounded per-key heaps in one pass over each partition.
  * `partial = true` runs map-side (no required distribution) and emits
  * ≤ k rows per key per partition; the final instance requires
  * clustering on `keys` (EnsureRequirements inserts the hash exchange)
  * and reduces the survivors to exactly the global per-key top k.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExprs = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(orderExprs, childOutput)
      // max-heap under ord: head = worst row currently kept for the key
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      while (it.hasNext) {
        val row = it.next()
        // the projection reuses its buffer — look up with the transient
        // key and copy ONLY on first sight of a key (one allocation per
        // key, not per row; rows likewise copy only when they enter a
        // heap, since the scan iterator reuses its row)
        val key = keyProj(row)
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      // emit best-first within each key (dequeueAll is worst-first)
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans TopKPerKey as partial → (exchange via EnsureRequirements) →
  * final, mirroring partial aggregation.
  */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Builder bridge (private[sql] Dataset.ofRows access).
  *
  * In Spark 4 a `Column` wraps a ColumnNode that only the analyzer can
  * resolve, and it resolves them only in built-in operators — so we
  * piggyback: run the keys through a throwaway `select` and the sort
  * columns through a throwaway `sortWithinPartitions`, then lift the
  * RESOLVED catalyst expressions out of those analyzed plans (exprIds
  * agree because both resolve against the same analyzed child).
  */
object TopKPerKeyBuilder {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
  import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

  def topKPerKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
                 k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    // make the strategy available even on sessions built without the
    // GraftExtensions config (idempotent)
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val keys = df.select(keyCols: _*).queryExecution.analyzed match {
      case Project(projectList, _) =>
        projectList.map { case a: Alias => a.child; case e => e }
      case other => throw new IllegalArgumentException(s"unexpected key plan: $other")
    }
    val order = df.sortWithinPartitions(orderCols: _*).queryExecution.analyzed match {
      case Sort(sortOrder, _, _, _) => sortOrder
      case other => throw new IllegalArgumentException(s"unexpected sort plan: $other")
    }
    Dataset.ofRows(spark, TopKPerKey(keys, order, k, df.queryExecution.analyzed))
  }
}
