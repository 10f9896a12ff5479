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

  test("no registry query runs an unpartitioned window over unaggregated input") {
    // The scale rule behind GlobalRank (VERDICT r1 item 1): a Window with
    // an empty partition spec funnels its whole input through ONE task, so
    // it is only ever legal above an aggregation (year rows, daily totals,
    // per-bucket stats — bounded), never directly over a scan/join of a
    // table that grows with the data. Checked on the optimized logical plan
    // for EVERY registry query, so a future query can't reintroduce q50's
    // original shape.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    for (q <- SparkEntry.registry) {
      val plan = q.run(spark, sf0001).queryExecution.optimizedPlan
      val offenders = plan.collect {
        // A partition spec of only foldable expressions is still one task —
        // treat it exactly like an empty spec. No engine code writes
        // partitionBy(lit(...)) today (Windows.bounded deliberately emits an
        // empty spec); this future-proofs against anyone introducing it,
        // since Spark 4's EliminateWindowPartitions strips foldable specs to
        // empty anyway.
        case w: LWindow if w.partitionSpec.forall(_.foldable) &&
          w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(
        offenders.isEmpty,
        s"${q.name}: unpartitioned Window over unaggregated input:\n${offenders.mkString("\n")}")
    }
  }

  test("q285 join filter reaches the fact scan as a dynamic partition filter") {
    // The dim filter (2 of 5 categories) must prune fact DIRECTORIES at
    // runtime via DPP — a plan that reads all 5 partitions and filters
    // after the join defeats the partitioned layout.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = SparkEntry.queries("q285_dynamic_partition_pruning")(spark, sf0001)
    val root = df.queryExecution.executedPlan
    root.executeCollect()
    // AQE hides subtrees inside query stages (plan is a field, not a
    // child) — recurse through them to reach the fact scan
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case s: FileSourceScanExec => s } ++
        (p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan } ++
          p.collect { case q: QueryStageExec => q.plan }).flatMap(allScans)
    val factScan = allScans(root)
      .find(_.toString.contains("dynamicpruning"))
    assert(factScan.isDefined, s"no dynamicpruning partition filter in:\n$root")
    val partsRead = factScan.get.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(2L), s"expected 2 of 5 partitions read, got $partsRead")
  }

  test("q293 AQE actually splits the hot partition at runtime (skew join)") {
    val (rows, plan) = graft.queries.Q293.runWithPlan(spark, sf0001)
    assert(rows.length == 5)
    // the SMJ must carry the runtime skew-split marker; a plan without it
    // means the funneled key ran through ONE oversized task
    assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true"),
      s"no runtime skew split in:\n$plan")
  }

  test("q50 ntile ranks the fact rows under hashpartitioning(_bkt)") {
    // The customer rows (the side that grows with SF) must flow through the
    // distributed bucket window, not a single-task global window. (The
    // per-bucket stats branch DOES use a single partition — over <= 32
    // aggregate rows, which is the whole point of the stitch.)
    val plan = finalPlan(SparkEntry.queries("q50_ntile")(spark, sf0001))
    assert(plan.contains("hashpartitioning(_bkt"), s"fact window not bucket-partitioned:\n$plan")
  }

  test("q92 funnel scans events exactly once") {
    // VERDICT r2 item 3: the three funnel stages must share ONE pass over
    // the events table (window flags), not one filtered scan per stage.
    val df = SparkEntry.queries("q92_funnel")(spark, sf0001)
    df.collect()
    val scans = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE appends a duplicate print
      .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected 1 events scan, got $scans")
  }

  test("q26 exact dedup uses map-side partial aggregation on the digest") {
    val plan = finalPlan(SparkEntry.queries("q26_dedup_exact")(spark, sf0001))
    // the sha2 digest becomes an internal _groupingexpression; the shuffle
    // must be keyed on it, preceded by a partial aggregate (map-side combine)
    assert(plan.contains("hashpartitioning(_groupingexpression"), s"wrong shuffle key:\n$plan")
    assert(plan.contains("partial_min(doc_id"), s"no map-side combine:\n$plan")
  }

  test("q95 decontaminate never keyed-shuffles the corpus") {
    // The round-5 shape: per-doc hash sets intersect row-locally against a
    // one-row broadcast benchmark union. The ONLY exchanges allowed are
    // broadcasts and the final ORDER BY's range exchange — a reintroduced
    // explode->join->groupBy would show up as hashpartitioning.
    val plan = finalPlan(SparkEntry.queries("q95_decontaminate")(spark, sf0001))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus side keyed-shuffled:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"benchmark union not broadcast:\n$plan")
  }

  test("q88 edge construction is one keyed aggregation (no shingle self-join)") {
    // Edges must come from the df==2 bucket directly; any join before the
    // label loop means the df-count-join/self-join shape crept back. The
    // label loop itself joins labels to edges — so assert on the EDGE
    // subplan, not the whole query.
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf0001)
      .filter(graft.functions.TextFunctions.tokenCount(col("text")) >= 3)
    val sh = docs.select(
      col("doc_id"),
      explode(graft.functions.ShingleHashSetExpr(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("h"))
    val edges = sh.groupBy("h").agg(
      count(lit(1)).as("df"),
      min(col("doc_id")).as("src"),
      max(col("doc_id")).as("dst"))
      .filter(col("df") === 2)
      .select("src", "dst")
      .distinct()
    val plan = finalPlan(edges)
    assert(!plan.contains("Join"), s"edge construction joins:\n$plan")
    // Scalar count/min/max must stay in codegen HashAggregate with a
    // map-side partial — collect_list's ObjectHashAggregate (array
    // buffers, no whole-stage codegen) is the shape this replaced.
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      s"no map-side partial aggregation:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"),
      s"edge aggregation fell back to ObjectHashAggregate:\n$plan")
  }

  test("q183 chunking shuffles only for the final presentation sort") {
    // the chunk expansion itself (split → sequence → transform/slice →
    // posexplode) must be narrow: exactly one exchange in the whole plan,
    // the rangepartitioning that serves the deterministic ORDER BY
    // AQE's toString prints the Final AND Initial plans — count only the final
    val plan = finalPlan(SparkEntry.queries("q183_token_chunks")(spark, sf0001))
      .split("== Initial Plan ==").head
    val exchanges = "(?i)exchange (hash|range|single)partitioning".r
      .findAllIn(plan).toList
    assert(exchanges.size == 1 && exchanges.head.toLowerCase.contains("range"),
      s"expected one range exchange, got $exchanges:\n$plan")
  }

  test("q187 per-key sample runs through the TopKPerGroup physical operator") {
    val plan = finalPlan(SparkEntry.queries("q187_reservoir_per_key")(spark, sf0001))
    assert(plan.contains("TopKPerGroup"), s"physical op missing:\n$plan")
    assert(!plan.contains("Window"), s"fell back to a window:\n$plan")
  }

  test("q179 EWMA taps share one partitioned window (single sort, no tap fan-out)") {
    val plan = finalPlan(SparkEntry.queries("q179_ewma_smoothing")(spark, sf0001))
      .split("== Initial Plan ==").head
    assert(plan.contains("hashpartitioning(user_id"), s"window not partitioned:\n$plan")
    // 10 lag taps must collapse into ONE Window operator
    val windows = "(?m)^\\s*[+:*-]*\\s*Window ".r.findAllIn(plan).toList
    assert(windows.size == 1, s"expected one Window operator, got ${windows.size}:\n$plan")
  }

  test("q255 WAU joins the bounded day calendar by broadcast, never shuffling it") {
    val plan = finalPlan(SparkEntry.queries("q255_wau_stickiness")(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"day calendar must broadcast:\n$plan")
  }

  test("q245 pseudonymization stays a projection: no join, no window, one scan") {
    val plan = finalPlan(SparkEntry.queries("q245_pseudonymize")(spark, sf0001))
    // the hash is row-local; the only shuffles are the distinct-aggregate's
    // own phases — a Join or Window would mean the pseudonym mapping was
    // materialized as a table instead of an expression
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    // count scans in the FINAL section only (AQE's toString repeats the
    // initial plan below it)
    val finalSection = plan.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(finalSection).size == 1,
      s"events must scan once:\n$plan")
  }

  test("q264 chunking is row-local: no window, no doc-keyed exchange, chunk-level explode") {
    val plan = finalPlan(SparkEntry.queries("q264_content_chunks")(spark, sf0001))
    // the r18 rewrite assembles chunks with array expressions per document;
    // a Window or a doc_id-keyed exchange would mean the token-explode +
    // reassembly shape crept back in
    assert(!plan.contains("Window"), s"chunking must not window:\n$plan")
    assert(!plan.contains("hashpartitioning(doc_id"),
      s"chunk assembly must not shuffle by doc:\n$plan")
    assert(plan.contains("Generate explode"), s"chunk rows come from one explode:\n$plan")
    assert(!plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      s"source attribution should not force a second data-sized shuffle:\n$plan")
  }

  test("q176 funnel is one keyed aggregation pass (no joins, no windows)") {
    val plan = finalPlan(SparkEntry.queries("q176_funnel_counts")(spark, sf0001))
    // the per-user fold is a groupBy(user) + aggregate(); stage counting
    // joins only the |stages|+1-row histogram (broadcast)
    assert(!plan.contains("SortMergeJoin"), s"data-sized join in funnel:\n$plan")
    assert(!plan.contains("Window"), s"funnel should not window:\n$plan")
  }
}
