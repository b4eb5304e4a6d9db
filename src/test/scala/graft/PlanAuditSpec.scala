package graft

import graft.api.PlanAudit
import org.apache.spark.sql.functions._

class PlanAuditSpec extends SparkSpecBase {

  test("a disciplined star join passes the audit and reports its broadcasts") {
    val df = SparkEntry.queries("q5_region_revenue")(spark, sf)
    val f = PlanAudit.findings(df).map(x => x.check -> x).toMap
    assert(PlanAudit.passes(df), s"q5 should pass: ${PlanAudit.findings(df)}")
    assert(f("cartesian_product").ok)
    assert(f("broadcast_exchanges").detail.drop(2).toInt >= 1,
      s"q5 broadcasts its dims: ${f("broadcast_exchanges")}")
  }

  test("a cartesian plan fails the audit") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = Tables.documents(spark, sf).select("doc_id")
      val b = Tables.documents(spark, sf).select(col("doc_id").as("other"))
      val crossed = a.crossJoin(b)
      val f = PlanAudit.findings(crossed).map(x => x.check -> x).toMap
      assert(!f("cartesian_product").ok, s"cross join must flag: $f")
      assert(!PlanAudit.passes(crossed))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("the shuffle budget catches an over-shuffling chain") {
    val docs = Tables.documents(spark, sf)
    val noisy = docs.repartition(8, col("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .repartition(8, col("n"))
      .groupBy("n").agg(count(lit(1)).as("m"))
    assert(!PlanAudit.passes(noisy, maxShuffles = 1))
    assert(PlanAudit.passes(noisy, maxShuffles = 6))
  }

  test("scan metadata reports column pruning") {
    val slim = Tables.documents(spark, sf).select("doc_id", "lang")
      .filter(col("lang") === "en")
    val f = PlanAudit.findings(slim).map(x => x.check -> x).toMap
    val detail = f("parquet_scans").detail
    assert(detail.startsWith("n=1 "), s"expected exactly one scan: $detail")
    assert(detail.contains("read_cols=[2]"), s"expected 2-column scan: $detail")
    assert(detail.contains("pushed_filters=1"), s"expected a pushed filter: $detail")
  }
}
