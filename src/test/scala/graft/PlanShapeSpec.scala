package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression guards: the scale properties claimed in README
  * (broadcast joins on the star schema, filter pushdown, column pruning,
  * partitioned windows) asserted against the finalized physical plans —
  * so a refactor that silently degrades a plan fails CI.
  */
class PlanShapeSpec extends SparkSuite {

  private def finalPlan(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q16 star join resolves to broadcast-hash joins, no sort-merge") {
    val plan = finalPlan(SparkEntry.queries("q16_join_revenue")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("q61 filters are pushed to the parquet scan") {
    val plan = finalPlan(SparkEntry.queries("q61_tpch_q6")(spark, sf0001))
    // plan toString truncates the filter list — check prefix + the first
    // pushed range predicate
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipda"), s"expected pushed range filters:\n$plan")
  }

  test("q01 scan is pruned to exactly the three projected columns") {
    val plan = finalPlan(SparkEntry.queries("q01_scan_project_sort")(spark, sf0001))
    assert(
      plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"scan not pruned:\n$plan")
  }

  test("q14 window runs partitioned by user_id (no global window)") {
    val plan = finalPlan(SparkEntry.queries("q14_event_gaps")(spark, sf0001))
    assert(plan.contains("hashpartitioning(user_id"), s"window not partitioned:\n$plan")
  }

  test("q26 exact dedup uses map-side partial aggregation on the digest") {
    val plan = finalPlan(SparkEntry.queries("q26_dedup_exact")(spark, sf0001))
    // the sha2 digest becomes an internal _groupingexpression; the shuffle
    // must be keyed on it, preceded by a partial aggregate (map-side combine)
    assert(plan.contains("hashpartitioning(_groupingexpression"), s"wrong shuffle key:\n$plan")
    assert(plan.contains("partial_min(doc_id"), s"no map-side combine:\n$plan")
  }
}
