package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.plans.TopKPerKeyBuilder

/** Whole-operator custom plan: top-k rows per key WITHOUT a window sort.
  *
  * `row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`
  * fully sorts each key group post-shuffle. This operator plans as
  * partial-heap → hash exchange → final-heap (see
  * org.apache.spark.sql.graft.plans.TopKPerKeyExec): O(n log k) work,
  * and only ≤ k rows per (key × partition) cross the shuffle. Use it
  * when the rank itself isn't needed — only membership in the top k.
  *
  * {{{
  *   TopK.perKey(lineitems, Seq(col("l_orderkey")),
  *     Seq(col("l_extendedprice").desc), k = 5)
  * }}}
  */
object TopK {
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    TopKPerKeyBuilder.topKPerKey(df, keys, order, k)
}
