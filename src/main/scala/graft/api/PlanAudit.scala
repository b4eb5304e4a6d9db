package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Runtime PLAN LINT — the operational form of the repo's
  * PlanInvariantsSpec discipline, exposed as a library call so a
  * deployment can gate its OWN queries the way this repo gates its
  * inventory ("would this plan survive 100×?" asked of the plan, not
  * the wall clock). `audit(df)` inspects the query's physical plan
  * WITHOUT executing it and returns one row per check:
  *
  *  - `cartesian_product` (FAIL when present): the classic silent
  *    scale-killer — a missing join key works at test SF and explodes
  *    at 100 TB.
  *  - `shuffle_exchanges` (FAIL past `maxShuffles`): every exchange is
  *    a full data movement; a plan that shuffles eight times usually
  *    lost a partitioning it could have reused.
  *  - `single_partition_exchange` (FAIL past `maxSinglePartition`):
  *    all-to-one-task funnels (unpartitioned windows/global
  *    aggregations over unbounded inputs). Bounded-row finals (a
  *    k-row rank window) legitimately use one — hence a budget, not a
  *    ban.
  *  - `broadcast_exchanges` (info): how many relations ride to every
  *    executor; each must be driver-resident-small.
  *  - `codegen_spans` (info): WholeStageCodegen region count — wide
  *    spans mean the hot path stays fused.
  *  - `parquet_scans` (info): scan count, how many carry pushed
  *    filters, how many read a pruned column subset.
  *
  * Reads the FORMATTED explain text rather than walking exec-node
  * classes: AQE wraps the tree in AdaptiveSparkPlanExec (children not
  * traversable pre-execution) and the text form is stable across
  * DSv1/DSv2 scan nodes — the same reason PlanInvariantsSpec asserts
  * on explain text. Purely driver-side; never touches data.
  */
object PlanAudit {

  /** One lint row. `ok = false` means the plan violates the budgeted
    * scale contract and should not ship to the large cluster as-is.
    */
  case class Finding(check: String, detail: String, ok: Boolean)

  def findings(df: DataFrame, maxShuffles: Int = 6,
               maxSinglePartition: Int = 1): Seq[Finding] = {
    // node-shape patterns read the SIMPLE plan string (nodes print as
    // "Exchange hashpartitioning(...)"); scan metadata reads FORMATTED
    // mode, where PushedFilters/ReadSchema are not length-truncated
    val simple = df.queryExecution.executedPlan.toString
    val fmt = df.queryExecution.explainString(FormattedMode)
    def count(txt: String, marker: String): Int = {
      var (n, i) = (0, txt.indexOf(marker))
      while (i >= 0) { n += 1; i = txt.indexOf(marker, i + 1) }
      n
    }
    val cartesian = count(simple, "CartesianProduct")
    val exchanges = count(simple, "Exchange hashpartitioning") +
      count(simple, "Exchange rangepartitioning") +
      count(simple, "Exchange RoundRobinPartitioning")
    val singles = count(simple, "Exchange SinglePartition")
    val bcast = count(simple, "BroadcastExchange")
    val codegen = count(fmt, "WholeStageCodegen (")
    val scanLines = fmt.linesIterator.count(_.contains("Scan parquet"))
    val pushed = fmt.linesIterator.count { l =>
      val i = l.indexOf("PushedFilters: [")
      i >= 0 && l.charAt(i + "PushedFilters: [".length) != ']'
    }
    // a pruned scan reads a strict column subset; formatted mode prints
    // the read schema per scan node as ReadSchema: struct<...>
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(fmt).map(_.group(1)).toSeq
    Seq(
      Finding("cartesian_product", s"n=$cartesian", cartesian == 0),
      Finding("shuffle_exchanges", s"n=$exchanges budget=$maxShuffles",
        exchanges <= maxShuffles),
      Finding("single_partition_exchange",
        s"n=$singles budget=$maxSinglePartition", singles <= maxSinglePartition),
      Finding("broadcast_exchanges", s"n=$bcast", ok = true),
      Finding("codegen_spans", s"n=$codegen", ok = true),
      Finding("parquet_scans",
        s"n=$scanLines pushed_filters=$pushed read_cols=" +
          readSchemas.map(s => if (s.isEmpty) 0 else s.count(_ == ',') + 1)
            .mkString("[", ",", "]"),
        ok = true))
  }

  /** The lint as data: (check, detail, ok) rows, `passed` = every
    * budgeted check ok.
    */
  def audit(df: DataFrame, maxShuffles: Int = 6,
            maxSinglePartition: Int = 1): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    findings(df, maxShuffles, maxSinglePartition).toDF()
  }

  /** True iff no budgeted check fails — the boolean a CI gate wants. */
  def passes(df: DataFrame, maxShuffles: Int = 6,
             maxSinglePartition: Int = 1): Boolean =
    findings(df, maxShuffles, maxSinglePartition).forall(_.ok)
}
