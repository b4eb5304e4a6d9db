package graft

import graft.operators.Relational
import graft.plans.TopK
import org.apache.spark.sql.functions._

class TopKPlanSpec extends SparkSpecBase {

  test("TopK.perKey matches the window row_number formulation") {
    val fast = Relational.topkPerGroupFast(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val window = Relational.topkPerGroup(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(fast === window)
    assert(fast.nonEmpty)
  }

  test("TopKPerKey plans as partial heap -> exchange -> final heap") {
    val df = TopK.perKey(Tables.orders(spark, sf),
      Seq(col("o_orderpriority")), Seq(col("o_totalprice").desc), k = 3)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // final (partial=false) above the exchange, partial (=true) below it;
    // first occurrences land in AQE's "Final Plan" section
    val finalIdx = plan.indexOf(", false")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf(", true")
    assert(finalIdx >= 0 && exchangeIdx >= 0 && partialIdx >= 0, plan)
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx, plan)
  }

  test("TopK.perKey is exact on a skewed key distribution") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i))
      .toDF("key", "v")
    val got = TopK.perKey(df, Seq(col("key")), Seq(col("v").desc), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val expected = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i))
      .groupBy(_._1).toSeq.flatMap { case (_, vs) => vs.sortBy(-_._2).take(2) }.toSet
    assert(got === expected)
  }
}
