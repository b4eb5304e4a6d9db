package graft

/** Whole-inventory plan guard: no query may plan an unconstrained
  * CartesianProduct — the classic silent scale-killer (a missing join
  * key quietly works at test SF and explodes at 100 TB). The only
  * exemption is the intentionally-blocked all-pairs baseline
  * (`dedup_embedding`, whose sub-quadratic twin is
  * `dedup_embedding_lsh`); its plan is broadcast-nested-loop at test
  * scale but would degrade to cartesian on two large sides by design.
  */
class PlanInvariantsSpec extends SparkSpecBase {

  private val exempt = Set("dedup_embedding")

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (n, _) => exempt(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  // Plan-SHAPE regressions: these are the scale properties §5.1 claims.
  // A refactor that silently loses one (filter stops reaching the scan,
  // rank limit moves above the exchange, a dim join degrades to
  // sort-merge) still passes every value test at sf0.001 — only the
  // plan text catches it before 100 TB does.

  test("q1 ships its date filter to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"),
      s"no pushed l_shipdate filter in:\n$p")
  }

  test("funnel stage filters reach the events scan") {
    val p = plan("events_funnel")
    assert(p.contains("EqualTo(event_type,view)"), s"no pushed stage filter in:\n$p")
  }

  test("q5 star join broadcasts every dimension (no sort-merge join at dim scale)") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$p")
  }

  test("batched vector search limits per-query candidates before the exchange") {
    val p = plan("vs_search_batch")
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed below shuffle:\n$p")
  }

  test("bm25 never shuffles the corpus (one scalar-stats exchange, top-k as TakeOrdered)") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"$exchanges exchanges in bm25 plan:\n$p")
  }

  test("topk_per_group_fast plans the custom heap operator") {
    assert(plan("topk_per_group_fast").contains("TopKPerKey"))
  }
}
