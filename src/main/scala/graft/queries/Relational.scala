package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Fmt, Tables}
import graft.core.Fmt.{r4, r6}
import graft.ops.Upsert

/** Core relational query surface: scans, filters, aggregations, windows,
  * joins, set ops, scalar functions (SURVEY.md §2.1-§2.8).
  *
  * Every query is declarative DataFrame code — Catalyst handles predicate
  * pushdown, column pruning, partial aggregation and join-strategy choice
  * (broadcast for the small dimensions). Determinism policy of §2.13:
  * total ORDER BY with unique tie-breaks, ROUND on float aggregates
  * (4 decimals for ~1e5+ magnitudes, 6 for small), timestamps rendered as
  * UTC strings.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  /** Executes `agg` (the co-bucketed join's consumer) ONCE via eager
    * localCheckpoint and REQUIREs that the JOIN subtree of that same
    * executed plan planned with ZERO shuffle exchanges — the r19 form of
    * the bucketed-layout proof (q325/q335/q345/q347/q364). The r18 form
    * first ran the bare join through a separate noop sink just to have
    * an executed plan to assert on, paying the whole join TWICE per
    * query (one extra full execution per bench pass — guide §1.2: don't
    * compute things you throw away). Scoping the count to the join's
    * subtree keeps the invariant exactly as strong: the aggregate's own
    * exchange above the join is outside the claim either way. */
  private def requireJoinExchangeFree(
      agg: org.apache.spark.sql.DataFrame, what: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val out = agg.localCheckpoint(eager = true) // the ONE execution
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => q +: walk(q.plan)
      case other                    => other +: other.children.flatMap(walk)
    }
    val all = walk(agg.queryExecution.executedPlan)
    val join = all.collectFirst { case j: BaseJoinExec => j }.getOrElse(
      sys.error(s"$what: no join node in the executed plan:\n" +
        agg.queryExecution.executedPlan))
    val n = walk(join).count(_.isInstanceOf[ShuffleExchangeExec])
    require(n == 0,
      s"$what co-bucketed join must plan exchange-free, got $n:\n$join")
    out
  }


  /** Q1 — scan + projection + total sort (ref: column selection
    * `reduction.scala:32-43`, ordered sink `reduction.scala:23`). */
  val q01 = QueryDef(
    "q01_scan_project_sort",
    (s, d) =>
      li(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    headline = true)

  /** Q2 — comparison filter + count (ref: `RDDOperations.scala:21-34`,
    * power > 5 kW filter; mapped to DataFrame per SURVEY §2.9). */
  val q02 = QueryDef(
    "q02_filter_count",
    (s, d) => li(s, d).filter(col("l_quantity") > 45).agg(count(lit(1)).as("cnt")),
    Some("SELECT COUNT(*) AS cnt FROM lineitem WHERE l_quantity > 45"))

  /** Q3 — null-predicate disjunction count (ref: missing-measurement scan
    * `Cleaning.scala:59-60`). */
  val q03 = QueryDef(
    "q03_null_filter_count",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("value").isNull || col("user_id").isNull)
        .agg(count(lit(1)).as("cnt")),
    Some("SELECT COUNT(*) AS cnt FROM events WHERE value IS NULL OR user_id IS NULL"))

  /** Q4 — cast-failure count via try_cast (ref: string→double cast with
    * invalid→null, `Cleaning.scala:97-106`; ANSI-safe in Spark 4). */
  val q04 = QueryDef(
    "q04_cast_failures",
    (s, d) =>
      Tables.events(s, d)
        .select(expr("try_cast(props AS DOUBLE)").as("dv"))
        .filter(col("dv").isNull)
        .agg(count(lit(1)).as("cnt")),
    Some("SELECT COUNT(*) AS cnt FROM events WHERE TRY_CAST(props AS DOUBLE) IS NULL"))

  /** Q5 — multi-column distinct (ref: dedup diagnostics
    * `Cleaning.scala:109-120`). */
  val q05 = QueryDef(
    "q05_distinct_count",
    (s, d) =>
      li(s, d).select("l_partkey", "l_suppkey").distinct().agg(count(lit(1)).as("cnt")),
    Some("SELECT COUNT(*) AS cnt FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"))

  /** Q6 — CASE WHEN bucketing + count (ref: Low/Medium/High usage
    * categorization, `RDDOperations.scala:121-137`). */
  val q06 = QueryDef(
    "q06_case_buckets",
    (s, d) =>
      li(s, d)
        .select(
          when(col("l_quantity") < 10, "Low")
            .when(col("l_quantity") < 30, "Medium")
            .otherwise("High")
            .as("cat"))
        .groupBy("cat")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("cat"),
    Some("""SELECT CASE WHEN l_quantity < 10 THEN 'Low'
                        WHEN l_quantity < 30 THEN 'Medium'
                        ELSE 'High' END AS cat, COUNT(*) AS cnt
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** Q7 — TPC-H Q1-shaped multi-aggregate group-by (ref: hourly AVG
    * aggregation `reduction.scala:10-24`, SQL AVG `SQLOperations.scala:39-46`).
    * Partial (map-side) aggregation + AQE-coalesced shuffle — the plan that
    * scales to 100 TB: one shuffle keyed on the two low-cardinality flags. */
  val q07 = QueryDef(
    "q07_agg_pricing",
    (s, d) =>
      li(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r4(avg(col("l_extendedprice"))).as("avg_price"),
          r6(sum(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
                   ROUND(AVG(l_extendedprice),4) AS avg_price,
                   ROUND(SUM(l_quantity),6) AS sum_qty, COUNT(*) AS cnt
            FROM lineitem GROUP BY 1,2 ORDER BY 1,2"""),
    headline = true)

  /** Q8 — exact COUNT(DISTINCT) (ref: distinct days `SQLOperations.scala:59`). */
  val q08 = QueryDef(
    "q08_count_distinct",
    (s, d) => ord(s, d).agg(countDistinct(col("o_custkey")).as("cnt")),
    Some("SELECT COUNT(DISTINCT o_custkey) AS cnt FROM orders"))

  /** Q9 — sample variance (ref: `SQLOperations.scala:61`). Scaled to
    * millions before rounding: cross-engine float accumulation noise on a
    * ~1e9 magnitude makes raw ROUND(..,4) a hash hazard (SURVEY §7.4). */
  val q09 = QueryDef(
    "q09_variance",
    (s, d) => ord(s, d).agg(r4(var_samp(col("o_totalprice")) / lit(1e6)).as("var_mm")),
    Some("SELECT ROUND(VAR_SAMP(o_totalprice)/1000000.0, 4) AS var_mm FROM orders"))

  /** Q10 — global min/max in ONE pass (ref: per-column scan loop at
    * `Transformation.scala:53-57` — the engine's single-pass replacement). */
  val q10 = QueryDef(
    "q10_minmax",
    (s, d) =>
      li(s, d).agg(
        r6(min(col("l_extendedprice"))).as("min_price"),
        r6(max(col("l_extendedprice"))).as("max_price")),
    Some("""SELECT ROUND(MIN(l_extendedprice),6) AS min_price,
                   ROUND(MAX(l_extendedprice),6) AS max_price FROM lineitem"""))

  /** Q11 — two-level calendar aggregation (ref: `SQLOperations.scala:125-132`). */
  val q11 = QueryDef(
    "q11_calendar_agg",
    (s, d) =>
      ord(s, d)
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(r4(avg(col("o_totalprice"))).as("avg_price"))
        .orderBy("y", "m"),
    Some("""SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS y,
                   CAST(MONTH(o_orderdate) AS INTEGER) AS m,
                   ROUND(AVG(o_totalprice),4) AS avg_price
            FROM orders GROUP BY 1,2 ORDER BY 1,2"""))

  /** Q12 — RANK over global order (ref: `SQLOperations.scala:74-87`).
    * Rank input is the ROUNDED aggregate so both engines rank identical
    * values; `y` breaks ties (§7.4 determinism note). */
  val q12 = QueryDef(
    "q12_rank_years",
    (s, d) => {
      val yearly = ord(s, d)
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(r4(avg(col("o_totalprice"))).as("ap"))
      yearly
        .withColumn("rk", rank().over(graft.core.Windows.bounded(col("ap").desc, col("y"))))
        .orderBy("rk", "y")
    },
    Some("""SELECT y, ap, CAST(RANK() OVER (ORDER BY ap DESC, y) AS INTEGER) AS rk
            FROM (SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS y,
                         ROUND(AVG(o_totalprice),4) AS ap
                  FROM orders GROUP BY 1)
            ORDER BY rk, y"""))

  /** Q13 — top-1-per-group via partitioned ROW_NUMBER (ref: top month per
    * year, `SQLOperations.scala:124-151`). */
  val q13 = QueryDef(
    "q13_top_month_per_year",
    (s, d) => {
      val monthly = ord(s, d)
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(r4(avg(col("o_totalprice"))).as("ap"))
      monthly
        .withColumn(
          "rn",
          row_number().over(Window.partitionBy(col("y")).orderBy(col("ap").desc, col("m"))))
        .filter(col("rn") === 1)
        .select("y", "m", "ap")
        .orderBy("y")
    },
    Some("""SELECT y, m, ap FROM (
              SELECT y, m, ap,
                     ROW_NUMBER() OVER (PARTITION BY y ORDER BY ap DESC, m) AS rn
              FROM (SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS y,
                           CAST(MONTH(o_orderdate) AS INTEGER) AS m,
                           ROUND(AVG(o_totalprice),4) AS ap
                    FROM orders GROUP BY 1,2))
            WHERE rn = 1 ORDER BY y"""))

  /** Q15 — CTE + uncorrelated scalar subquery (ref: above-average daily
    * totals, `SQLOperations.scala:97-114`). The scalar aggregate is
    * broadcast into the filter — no driver-side collect. */
  val q15 = QueryDef(
    "q15_above_avg_days",
    (s, d) => {
      val daily = ord(s, d)
        .groupBy(Fmt.date(col("o_orderdate")).as("d"))
        .agg(r4(sum(col("o_totalprice"))).as("total"))
      val avgTotal = daily.agg(r4(avg(col("total"))).as("avg_total"))
      daily
        .crossJoin(broadcast(avgTotal))
        .filter(col("total") > col("avg_total"))
        .select("d", "total")
        .orderBy("d")
    },
    Some("""WITH daily AS (
              SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
                     ROUND(SUM(o_totalprice),4) AS total
              FROM orders GROUP BY 1)
            SELECT d, total FROM daily
            WHERE total > (SELECT ROUND(AVG(total), 4) FROM daily) ORDER BY d"""))

  /** Q16 — TPC-H Q5-shaped 4-way star join (SURVEY §2.3). `nation` is
    * broadcast explicitly (25 rows); customer⋈orders⋈lineitem shuffle on
    * their keys — at 100 TB, AQE picks broadcast for any side under the
    * threshold and splits skewed partitions. */
  val q16 = QueryDef(
    "q16_join_revenue",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = ord(s, d)
      val l = li(s, d)
      val n = Tables.nation(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
        .orderBy(col("rev").desc, col("n_name"))
    },
    Some("""SELECT n_name, ROUND(SUM(l_extendedprice*(1-l_discount)),4) AS rev
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY 1 ORDER BY rev DESC, n_name"""),
    headline = true)

  /** Q17 — anti join / NOT IN (SURVEY §2.3; customers with no orders). */
  val q17 = QueryDef(
    "q17_anti_join",
    (s, d) =>
      Tables.customer(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT COUNT(*) AS cnt FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  /** Q18 — INTERSECT (SURVEY §2.7). */
  val q18 = QueryDef(
    "q18_intersect",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
    Some("""SELECT * FROM (SELECT c_nationkey AS nk FROM customer
            INTERSECT SELECT s_nationkey AS nk FROM supplier) ORDER BY nk"""))

  /** Q18b — EXCEPT (SURVEY §2.7). */
  val q18b = QueryDef(
    "q18b_except",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
    Some("""SELECT * FROM (SELECT c_nationkey AS nk FROM customer
            EXCEPT SELECT s_nationkey AS nk FROM supplier) ORDER BY nk"""))

  /** Q18c — UNION ALL + count (SURVEY §2.7). */
  val q18c = QueryDef(
    "q18c_union_all_count",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT COUNT(*) AS cnt FROM (SELECT c_nationkey AS nk FROM customer
            UNION ALL SELECT s_nationkey AS nk FROM supplier)"""))

  /** Q23 — string functions in grouping (SURVEY §2.8 F-group). */
  val q23 = QueryDef(
    "q23_string_group",
    (s, d) =>
      ord(s, d)
        .groupBy(col("o_orderpriority"), substring(col("o_orderpriority"), 1, 1).as("p1"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, SUBSTRING(o_orderpriority,1,1) AS p1, COUNT(*) AS cnt
            FROM orders GROUP BY 1,2 ORDER BY 1"""))

  /** Q24 — ROLLUP grouping sets (SURVEY §2.4 extension). */
  val q24 = QueryDef(
    "q24_rollup",
    (s, d) =>
      li(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first,
          col("cnt")),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, cnt"""))

  /** Q46 — CUBE grouping sets (SURVEY §2.4 extension). */
  val q46 = QueryDef(
    "q46_cube",
    (s, d) =>
      ord(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first,
          col("cnt")),
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, cnt"""))

  /** Q25 — manual min-max scaling, single stats pass + broadcast (ref:
    * `Transformation.scala:51-68`, fixed per SURVEY §3.2: ONE aggregation
    * for all stats instead of a scan per column). */
  val q25 = QueryDef(
    "q25_minmax_scale_top10",
    (s, d) => {
      val o = ord(s, d)
      val stats = o.agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(stats))
        .withColumn("scaled", r6((col("o_totalprice") - col("mn")) / (col("mx") - col("mn"))))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "scaled")
        .orderBy("o_orderkey")
    },
    Some("""WITH s AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders),
                 t AS (SELECT o_orderkey, ROUND((o_totalprice-mn)/(mx-mn),6) AS scaled
                       FROM orders, s ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
            SELECT o_orderkey, scaled FROM t ORDER BY o_orderkey"""))

  /** Q41 — equi join with range predicate (SURVEY §2.3 theta/range row):
    * lineitems shipped within 90 days of order date. */
  val q41 = QueryDef(
    "q41_date_range_join",
    (s, d) =>
      li(s, d)
        .join(
          ord(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT COUNT(*) AS cnt FROM lineitem JOIN orders
            ON l_orderkey = o_orderkey AND l_shipdate <= o_orderdate + INTERVAL 90 DAY"""))

  /** Q42 — semi join / EXISTS (SURVEY §2.3): customers with a 1998 order. */
  val q42 = QueryDef(
    "q42_semi_join",
    (s, d) =>
      Tables.customer(s, d)
        .join(
          ord(s, d).filter(year(col("o_orderdate")) === 1998),
          col("c_custkey") === col("o_custkey"),
          "left_semi")
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT COUNT(*) AS cnt FROM customer WHERE EXISTS
            (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND YEAR(o_orderdate) = 1998)"""))

  /** Q48 — window frame spec: 7-day rolling average of daily totals
    * (SURVEY §2.5 frame extension). Note: single ordered window over ~2.4k
    * daily rows — tiny state; at true scale the engine partitions by month
    * and stitches boundaries. */
  val q48 = QueryDef(
    "q48_rolling_avg",
    (s, d) => {
      val daily = ord(s, d)
        .groupBy(Fmt.date(col("o_orderdate")).as("dt"))
        .agg(r4(sum(col("o_totalprice"))).as("total"))
      daily
        .withColumn(
          "avg7",
          r4(avg(col("total")).over(graft.core.Windows.bounded(col("dt")).rowsBetween(-6, 0))))
        .orderBy("dt")
    },
    Some("""WITH daily AS (SELECT strftime(CAST(o_orderdate AS DATE),'%Y-%m-%d') AS dt,
                                  ROUND(SUM(o_totalprice),4) AS total
                           FROM orders GROUP BY 1)
            SELECT dt, total,
                   ROUND(AVG(total) OVER (ORDER BY dt ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),4) AS avg7
            FROM daily ORDER BY dt"""))

  /** Q50 — NTILE deciles over customers (SURVEY §2.5 analytic set).
    * customer grows with scale factor, so no unpartitioned window here:
    * [[graft.ops.GlobalRank]] computes the global row number distributed
    * (percentile buckets + offset stitch) and derives exact NTILE from it. */
  val q50 = QueryDef(
    "q50_ntile",
    (s, d) => {
      val r = graft.ops.GlobalRank.ranked(
        Tables.customer(s, d), col("c_acctbal"), Seq(col("c_custkey")))
      graft.ops.GlobalRank
        .dropInternal(r.withColumn("decile", graft.ops.GlobalRank.ntileExpr(10)))
        .select("c_custkey", "decile")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
                   CAST(NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS decile
            FROM customer ORDER BY c_custkey"""))

  /** Q81 — RANGE window frame over event time (SURVEY §2.5 frame
    * extension): per-customer trailing-30-day order total. Partitioned by
    * customer — distributed. Spark's `rangeBetween` takes long bounds, so
    * the frame is expressed on epoch seconds; ts→epoch is monotone, so
    * frame peers and bounds match DuckDB's `RANGE ... INTERVAL 30 DAYS
    * PRECEDING` over the timestamp directly. */
  val q81 = QueryDef(
    "q81_range_frame",
    (s, d) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-30L * 86400, 0)
      ord(s, d)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          r4(sum(col("o_totalprice")).over(w)).as("trail30"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
                   ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 4) AS trail30
            FROM orders ORDER BY o_orderkey"""))

  /** Q82 — exact percentiles + median (A-ext): Spark `percentile` uses the
    * same linear interpolation as DuckDB `quantile_cont`, so the two agree
    * exactly (unlike the Greenwald-Khanna sketch in q44). Exact percentile
    * buffers per-group values — at 100 TB this is the verification path;
    * the production path is q44's approx sketch. */
  val q82 = QueryDef(
    "q82_exact_percentiles",
    (s, d) =>
      li(s, d).agg(
        r4(expr("percentile(l_extendedprice, 0.25)")).as("p25"),
        r4(expr("median(l_extendedprice)")).as("p50"),
        r4(expr("percentile(l_extendedprice, 0.75)")).as("p75")),
    Some("""SELECT ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
                   ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
                   ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
            FROM lineitem"""))

  /** Q91 — top-k per group through the custom [[graft.plans.TopKPerGroup]]
    * operator (extension point (c)): bounded heaps + one k-rows-per-group
    * exchange instead of the window's full shuffle + partition sort. The
    * oracle is the ROW_NUMBER window form, so the operator's semantics
    * contract (equivalence under a total order) is hash-checked; TopKSpec
    * asserts the plan shape (partial+final, no SortExec). */
  val q91 = QueryDef(
    "q91_topk_per_group",
    (s, d) =>
      graft.ops.TopK.perGroup(
          li(s, d),
          Seq(col("l_returnflag")),
          Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
          k = 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber"),
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
            FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
                  FROM lineitem)
            WHERE rn <= 3
            ORDER BY l_returnflag, l_orderkey, l_linenumber"""))

  /** Q94 — keyed upsert ([[graft.ops.Upsert]]): a derived CDC batch
    * (every 100th order repriced +10%, plus clones of the 5 lowest keys
    * re-keyed above the existing range as inserts) merges into orders;
    * grouped totals over the merged frame prove replaced/untouched/new
    * rows all land exactly once. */
  val q94 = QueryDef(
    "q94_upsert",
    (s, d) => {
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val repriced = base
        .filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      val inserts = base
        .orderBy("o_orderkey").limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      val merged = Upsert.merge(base, repriced.unionByName(inserts), Seq("o_orderkey"))
      merged
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum(col("o_totalprice"))).as("total"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
                 ins AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_orderstatus, o_totalprice
                         FROM base ORDER BY o_orderkey LIMIT 5),
                 upd AS (
                   SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice
                   FROM base WHERE o_orderkey % 100 = 0
                   UNION ALL
                   SELECT * FROM ins),
                 merged AS (
                   SELECT * FROM upd
                   UNION ALL
                   SELECT b.* FROM base b ANTI JOIN upd u USING (o_orderkey))
            SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice), 4) AS total,
                   MAX(o_orderkey) AS max_key
            FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q100 — versioned upsert ([[graft.ops.Upsert.mergeLatest]], VERDICT r2
    * item 5): the CDC batch deliberately CONFLICTS with itself — every
    * key divisible by 200 appears twice (a +10% reprice at version 1 and
    * a +20% reprice at version 2). Latest-wins resolution must keep only
    * the version-2 row; keys divisible by 100 but not 200 keep their
    * version-1 reprice; everything else survives untouched. The oracle
    * resolves the same batch with ROW_NUMBER ... ORDER BY v DESC. */
  val q100 = QueryDef(
    "q100_upsert_versioned",
    (s, d) => {
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val updates = base
        .filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        .withColumn("_v", lit(1L))
        .unionByName(
          base.filter(col("o_orderkey") % 200 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 1.2)
            .withColumn("_v", lit(2L)))
      val merged = Upsert.mergeLatest(base, updates, Seq("o_orderkey"), "_v")
      merged
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum(col("o_totalprice"))).as("total"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
                 upd AS (
                   SELECT o_orderkey, o_orderstatus,
                          o_totalprice * 1.1 AS o_totalprice, 1 AS v
                   FROM base WHERE o_orderkey % 100 = 0
                   UNION ALL
                   SELECT o_orderkey, o_orderstatus, o_totalprice * 1.2, 2
                   FROM base WHERE o_orderkey % 200 = 0),
                 latest AS (
                   SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
                   QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY v DESC) = 1),
                 merged AS (
                   SELECT * FROM latest
                   UNION ALL
                   SELECT b.* FROM base b ANTI JOIN latest u USING (o_orderkey))
            SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice), 4) AS total,
                   MAX(o_orderkey) AS max_key
            FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q118 — snapshot-versioned table time travel
    * ([[graft.io.VersionedTable]]): even-key orders commit as version 1,
    * odd-key orders append as version 2; the query reads BOTH snapshots —
    * v1 through time travel after v2 exists — and aggregates each. The
    * oracle recomputes both aggregate sets straight from `orders`, so a
    * time-travel read that leaked v2 rows into v1 (or lost v1 rows from
    * latest) hash-fails. VersionedTableSpec covers the commit protocol
    * itself (atomicity, race retry, vacuum). */
  val q118 = QueryDef(
    "q118_time_travel",
    (s, d) => {
      val path = Scratch.dir("q118") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base.filter(col("o_orderkey") % 2 === 0), path)
      graft.io.VersionedTable.commitAppend(base.filter(col("o_orderkey") % 2 === 1), path)
      // totals scaled to millions before rounding: at sf0.1 the raw sum is
      // ~3.7e10, where cross-engine summation-order noise (~1e-4) sits ON
      // the ROUND(,4) boundary — the q09 hazard, bitten at scale
      val v1 = graft.io.VersionedTable.read(s, path, Some(1L))
        .agg(count(lit(1)).as("v1_cnt"), r4(sum("o_totalprice") / lit(1e6)).as("v1_total_mm"))
      val latest = graft.io.VersionedTable.read(s, path)
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice") / lit(1e6)).as("total_mm"))
      v1.crossJoin(latest)
    },
    Some("""SELECT
              (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS v1_cnt,
              (SELECT ROUND(SUM(o_totalprice)/1000000.0, 4) FROM orders WHERE o_orderkey % 2 = 0) AS v1_total_mm,
              (SELECT COUNT(*) FROM orders) AS cnt,
              (SELECT ROUND(SUM(o_totalprice)/1000000.0, 4) FROM orders) AS total_mm"""))

  /** Q132 — deletion-vector delete through the oracle gate: a SCATTERED
    * predicate (every 10th order, hits every file) is deleted by
    * [[graft.io.VersionedTable.deleteWhereDV]] — zero data files
    * rewritten, readers anti-join the (file, row position) vector — and
    * the surviving aggregate must equal the oracle's plain NOT-filter.
    * Totals scaled to millions before rounding (the q118 policy). */
  val q132 = QueryDef(
    "q132_delete_dv",
    (s, d) => {
      val path = Scratch.dir("q132") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base, path)
      graft.io.VersionedTable.deleteWhereDV(s, path, col("o_orderkey") % 10 === 0)
      graft.io.VersionedTable.read(s, path)
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice") / lit(1e6)).as("total_mm"))
    },
    Some("""SELECT COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm
            FROM orders WHERE o_orderkey % 10 <> 0"""))

  /** Q133 — MERGE (CDC apply) through the oracle gate
    * ([[graft.io.VersionedTable.merge]]): one atomic commit applies
    * updates (repriced every-100th key), deletes (every key ≡ 50 mod
    * 100) and inserts (5 re-keyed rows) against a stats-carrying
    * versioned table — manifest key ranges prune the candidate files,
    * only files holding matched keys rewrite, everything else carries by
    * reference. The oracle recomputes the merged state relationally, so
    * a lost survivor, resurrected delete, or double-applied update
    * hash-fails. Totals scaled to millions before rounding (the q118
    * policy). MergeSpec pins the file-surgery, CDF-replay, DV and
    * duplicate-key contracts. */
  val q133 = QueryDef(
    "q133_merge_cdc",
    (s, d) => {
      val path = Scratch.dir("q133") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base, path, "o_orderkey")
      val updates = base.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        .withColumn("_del", lit(false))
      val deletes = base.filter(col("o_orderkey") % 100 === 50)
        .withColumn("_del", lit(true))
      val inserts = base.orderBy("o_orderkey").limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("_del", lit(false))
      graft.io.VersionedTable.merge(
        s, path, updates.unionByName(deletes).unionByName(inserts),
        Seq("o_orderkey"), deleteFlag = Some("_del"))
      graft.io.VersionedTable.read(s, path)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum("o_totalprice") / lit(1e6)).as("total_mm"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
                 merged AS (
                   SELECT * FROM base
                   WHERE o_orderkey % 100 <> 0 AND o_orderkey % 100 <> 50
                   UNION ALL
                   SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1
                   FROM base WHERE o_orderkey % 100 = 0
                   UNION ALL
                   SELECT o_orderkey + 20000000, o_orderstatus, o_totalprice
                   FROM (SELECT * FROM base ORDER BY o_orderkey LIMIT 5))
            SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm,
                   MAX(o_orderkey) AS max_key
            FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q363 — TYPED manifest file-skipping through the oracle gate
    * ([[graft.io.VersionedTable.readWhereString]], VERDICT r15 item 4):
    * the documents corpus keyed by a STRING doc key — exactly the table
    * shape the long-only stats channel could never prune (string casts
    * recorded nothing). The range-clustered commit records stats3
    * string min/max per file; a stats-less second commit (rows INSIDE
    * the queried range) pins the safety rule — files without entries
    * always survive, so its rows MUST appear in the result. The oracle
    * recomputes both slices relationally; a dropped stats-less file, a
    * wrong UTF-8 range cut, or an off-by-one inclusive bound
    * hash-fails. TypedStatsSpec pins file-level pruning selectivity,
    * date/timestamp channels, compaction carry, and the purge refresh. */
  val q363 = QueryDef(
    "q363_typed_prune",
    (s, d) => {
      val path = Scratch.dir("q363") + "/tbl"
      val base = Tables.documents(s, d).select(
        concat(lit("D"), lpad(col("doc_id").cast("string"), 8, "0")).as("doc_key"),
        col("lang"), col("n_chars"))
      graft.io.VersionedTable.commitAppend(
        base.repartitionByRange(4, col("doc_key")), path, Seq("doc_key"))
      // stats-less control commit: rows inside the queried range that
      // pruning must NOT drop
      graft.io.VersionedTable.commitAppend(
        Tables.documents(s, d).filter(col("doc_id") % 7 === 0).select(
          concat(lit("D"), lpad(col("doc_id").cast("string"), 8, "0")).as("doc_key"),
          col("lang"), (col("n_chars") + 1000L).as("n_chars")),
        path)
      graft.io.VersionedTable.readWhereString(
          s, path, "doc_key", "D00000010", "D00000099")
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .orderBy("lang")
    },
    Some("""WITH base AS (SELECT 'D' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_key,
                                 lang, n_chars
                          FROM documents),
                 extra AS (SELECT 'D' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_key,
                                  lang, n_chars + 1000 AS n_chars
                           FROM documents WHERE doc_id % 7 = 0),
                 uni AS (SELECT * FROM base UNION ALL SELECT * FROM extra)
            SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM uni
            WHERE doc_key BETWEEN 'D00000010' AND 'D00000099'
            GROUP BY lang ORDER BY lang"""))

  /** Q367 — TYPED manifest pruning through the CATALYST read path
    * ([[graft.io.VersionedTable.table]] + the string stats3 channel —
    * VERDICT r16 item 1): the same doc-keyed corpus as q363, but the
    * predicates are ORDINARY DataFrame filters (a BETWEEN range and a
    * startsWith prefix) over `table()`, so the pruning decision is made
    * by [[graft.io.VersionedFileIndex]] at physical-planning time, not
    * by a caller naming bounds. A stats-less second commit (rows INSIDE
    * both predicates) pins the safety rule on the planner path: files
    * without typed entries must always survive. The oracle recomputes
    * both slices relationally; TypedIndexSpec pins the file-count cuts
    * (numFiles) this query's plan makes. */
  val q367 = QueryDef(
    "q367_table_typed_prune",
    (s, d) => {
      val path = Scratch.dir("q367") + "/tbl"
      val base = Tables.documents(s, d).select(
        concat(lit("D"), lpad(col("doc_id").cast("string"), 8, "0")).as("doc_key"),
        col("lang"), col("n_chars"))
      graft.io.VersionedTable.commitAppend(
        base.repartitionByRange(4, col("doc_key")), path, Seq("doc_key"))
      graft.io.VersionedTable.commitAppend(
        Tables.documents(s, d).filter(col("doc_id") % 7 === 0).select(
          concat(lit("D"), lpad(col("doc_id").cast("string"), 8, "0")).as("doc_key"),
          col("lang"), (col("n_chars") + 1000L).as("n_chars")),
        path)
      val t = graft.io.VersionedTable.table(s, path)
      val ranged = t.filter(col("doc_key").between("D00000010", "D00000099"))
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .withColumn("cut", lit("range"))
      val prefixed = t.filter(col("doc_key").startsWith("D000001"))
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .withColumn("cut", lit("prefix"))
      ranged.unionByName(prefixed).orderBy("cut", "lang")
    },
    Some("""WITH base AS (SELECT 'D' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_key,
                                 lang, n_chars
                          FROM documents),
                 extra AS (SELECT 'D' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_key,
                                  lang, n_chars + 1000 AS n_chars
                           FROM documents WHERE doc_id % 7 = 0),
                 uni AS (SELECT * FROM base UNION ALL SELECT * FROM extra)
            SELECT lang, cnt, chars, cut FROM (
              SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars,
                     'range' AS cut
              FROM uni WHERE doc_key BETWEEN 'D00000010' AND 'D00000099'
              GROUP BY lang
              UNION ALL
              SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars,
                     'prefix' AS cut
              FROM uni WHERE doc_key LIKE 'D000001%'
              GROUP BY lang)
            ORDER BY cut, lang"""))

  /** Q368 — FRACTIONAL (double, stats3 'F' channel) manifest pruning
    * through the Catalyst read path (VERDICT r16 item 3): a corpus
    * scored with a deterministic quality column in [0,1), range-
    * clustered on the score so per-file double bounds are tight, plus a
    * stats-less control commit whose rows sit INSIDE the queried band.
    * The query is a quality-threshold corpus cut — `quality > 0.8435`,
    * a bound the long channel's integer truncation could never express
    * (every file's truncated range is [0,0]) — through an ordinary
    * DataFrame filter over `table()`. The oracle recomputes both slices;
    * TypedIndexSpec pins the plan's file cut and the −0.0/NaN total-
    * order rules. */
  val q368 = QueryDef(
    "q368_double_prune",
    (s, d) => {
      val path = Scratch.dir("q368") + "/tbl"
      val scored = Tables.documents(s, d).select(
        col("doc_id"), col("lang"), col("n_chars"),
        ((col("doc_id") % 1000).cast("double") / lit(1000.0)).as("quality"))
      graft.io.VersionedTable.commitAppend(
        scored.repartitionByRange(4, col("quality")), path, Seq("quality"))
      // stats-less control: high-quality rows pruning must NOT drop
      graft.io.VersionedTable.commitAppend(
        scored.filter(col("doc_id") % 9 === 0)
          .withColumn("quality", col("quality") * lit(0.1) + lit(0.9)),
        path)
      graft.io.VersionedTable.table(s, path)
        .filter(col("quality") > 0.8435)
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .orderBy("lang")
    },
    Some("""WITH scored AS (SELECT doc_id, lang, n_chars,
                                   CAST(doc_id % 1000 AS DOUBLE) / 1000.0 AS quality
                            FROM documents),
                 extra AS (SELECT doc_id, lang, n_chars, quality * 0.1 + 0.9 AS quality
                           FROM scored WHERE doc_id % 9 = 0),
                 uni AS (SELECT * FROM scored UNION ALL SELECT * FROM extra)
            SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM uni WHERE quality > 0.8435
            GROUP BY lang ORDER BY lang"""))

  /** Q376 — DECIMAL manifest pruning through the Catalyst read path
    * (r18: the stats3 'C' slot — VERDICT r17 item 4): a priced corpus
    * whose price is DECIMAL(12,2) built from integer arithmetic (never
    * through double — exact in both engines), range-clustered so
    * per-file decimal bounds are tight, plus a stats-less control
    * commit whose rows sit INSIDE the queried band. The cut
    * `price BETWEEN 1100.25 AND 1310.75` has sub-integer bounds the
    * long channel's truncation cannot express; the in-plan REQUIRE
    * pins that the typed decimal cut strictly tightens the file set,
    * and the oracle recomputes the slice. TypedIndexSpec pins the
    * planner file counts, scale identity (12.5 == 12.50) and the
    * compaction lifecycle. */
  val q376 = QueryDef(
    "q376_decimal_prune",
    (s, d) => {
      val path = Scratch.dir("q376") + "/tbl"
      val priced = Tables.documents(s, d).select(
        col("doc_id"), col("lang"), col("n_chars"),
        concat(((col("doc_id") % 9000) + lit(1000)).cast("string"), lit("."),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"))
          .cast("decimal(12,2)").as("price"))
      graft.io.VersionedTable.commitAppend(
        priced.repartitionByRange(4, col("price")), path, Seq("price"))
      // stats-less control: in-band rows pruning must NOT drop
      graft.io.VersionedTable.commitAppend(
        priced.filter(col("doc_id") % 9 === 0)
          .withColumn("n_chars", col("n_chars") + lit(1000L)),
        path)
      val lo = new java.math.BigDecimal("1100.25")
      val hi = new java.math.BigDecimal("1310.75")
      val all = graft.io.VersionedTable.filesOf(s, path).size
      val hit = graft.io.VersionedTable.filesForRangesTyped(
        s, path, Map("price" -> (lo, hi))).size
      require(hit < all,
        s"decimal typed cut must tighten the file set: read $hit of $all " +
          "(is the 'C' slot recording?)")
      graft.io.VersionedTable.table(s, path)
        .filter(col("price").between(lit(lo), lit(hi)))
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .orderBy("lang")
    },
    Some("""WITH priced AS (SELECT doc_id, lang, n_chars,
                                   CAST(CAST(doc_id % 9000 + 1000 AS VARCHAR) || '.' ||
                                        lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                                        AS DECIMAL(12,2)) AS price
                            FROM documents),
                 extra AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars, price
                           FROM priced WHERE doc_id % 9 = 0),
                 uni AS (SELECT doc_id, lang, n_chars, price FROM priced
                         UNION ALL SELECT * FROM extra)
            SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM uni WHERE price BETWEEN 1100.25 AND 1310.75
            GROUP BY lang ORDER BY lang"""))

  /** Q371 — DOUBLE z-order composed with fractional pruning (r17:
    * `InterleaveBitsN.forFrame` quantile binning × the stats3 'F'
    * channel): a corpus lands SHUFFLED (hash-scattered small files — no
    * dimension clustered), gets `compact(zOrder = true)` on
    * (score double, day long), and a quality-threshold cut then reads
    * through `table()`'s planner pruning. Before this round the zOrder
    * path cast the score to long — every [0,1) value collapsed to 0, so
    * the compacted files' score bounds were all [0,1) and the cut read
    * EVERY file; quantile binning makes the score dimension real. The
    * query REQUIREs the layout claim structurally (the score slab's
    * typed file cut must be a strict subset after compaction) and the
    * oracle pins the values; ZOrderSpec pins the bin arithmetic. */
  val q371 = QueryDef(
    "q371_zorder_double_prune",
    (s, d) => {
      val path = Scratch.dir("q371") + "/tbl"
      val scored = Tables.documents(s, d).select(
        col("doc_id"), col("lang"), col("n_chars"),
        ((col("n_chars") % 499).cast("double") / lit(499.0)).as("score"),
        (col("doc_id") % 30).as("day"))
      graft.io.VersionedTable.commitAppend(
        scored.repartition(8, col("doc_id")), path, Seq("score", "day"))
      graft.io.VersionedTable.compact(
        s, path, targetRowsPerFile = 80, zOrder = true)
      val all = graft.io.VersionedTable.filesOf(s, path).size
      val hit = graft.io.VersionedTable.filesForRangesTyped(
        s, path, Map("score" -> (0.7, 1.0))).size
      require(hit < all,
        s"z-ordered score slab must cut files: read $hit of $all — the " +
          "double dimension collapsed (cast-to-long layout?)")
      graft.io.VersionedTable.table(s, path)
        .filter(col("score") >= 0.7)
        .groupBy("day")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .orderBy("day")
    },
    Some("""WITH scored AS (SELECT doc_id % 30 AS day, n_chars,
                                   CAST(n_chars % 499 AS DOUBLE) / 499.0 AS score
                            FROM documents)
            SELECT day, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM scored WHERE score >= 0.7
            GROUP BY day ORDER BY day"""))

  /** Q134 — predicate-scoped INSERT OVERWRITE through the oracle gate
    * ([[graft.io.VersionedTable.replaceWhere]]): reload the
    * o_orderkey∈[1000,4999] slice with corrected (repriced, thinned)
    * rows in one atomic commit — only files holding slice rows rewrite,
    * the rest carries by reference. The oracle recomputes the post-reload
    * state relationally, so a leaked old slice row, a lost out-of-slice
    * row, or a double-applied reload hash-fails. ReplaceWhereSpec pins
    * the file-surgery, escapee-refusal, CDF and idempotency contracts. */
  val q134 = QueryDef(
    "q134_replace_where",
    (s, d) => {
      val path = Scratch.dir("q134") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base, path, "o_orderkey")
      val reload = base
        .filter(col("o_orderkey").between(1000, 4999) && col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") * 0.9)
      graft.io.VersionedTable.replaceWhere(
        s, path, col("o_orderkey").between(1000, 4999), reload)
      graft.io.VersionedTable.read(s, path)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum("o_totalprice") / lit(1e6)).as("total_mm"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
                 merged AS (
                   SELECT * FROM base WHERE o_orderkey NOT BETWEEN 1000 AND 4999
                   UNION ALL
                   SELECT o_orderkey, o_orderstatus, o_totalprice * 0.9
                   FROM base
                   WHERE o_orderkey BETWEEN 1000 AND 4999 AND o_orderkey % 3 <> 0)
            SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm
            FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q135 — needle-in-the-table point lookup through manifest bloom
    * sidecars ([[graft.io.VersionedTable.readKeys]]): the table commits
    * with per-file [[graft.io.FileBloom]]s on o_orderkey; the probe opens
    * only files whose bloom admits one of the keys — zero data-file
    * opens spent on pruning (vs footer blooms, which cost an open per
    * file). The oracle is a plain IN-list, so a false NEGATIVE (bloom
    * losing a key) or a semi-join dropping/duplicating rows hash-fails.
    * FileBloomSpec pins the no-false-negative and FPR properties;
    * VersionedTableSpec pins scattered-key pruning and merge
    * integration. */
  val q135 = QueryDef(
    "q135_bloom_point_lookup",
    (s, d) => {
      val path = Scratch.dir("q135") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      // two interleaved commits: every file spans the key domain, so only
      // the blooms can prune the probe
      graft.io.VersionedTable.commitAppend(
        base.filter(col("o_orderkey") % 2 === 0), path, Seq("o_orderkey"), Seq("o_orderkey"))
      graft.io.VersionedTable.commitAppend(
        base.filter(col("o_orderkey") % 2 === 1), path, Seq("o_orderkey"), Seq("o_orderkey"))
      val probe = Array(1L, 7L, 32L, 4000L, 15000L, 29999L, 123456789L)
      graft.io.VersionedTable.readKeys(s, path, "o_orderkey", probe)
        .select(col("o_orderkey"), col("o_orderstatus"),
          r4(col("o_totalprice")).as("price"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 4) AS price
            FROM orders
            WHERE o_orderkey IN (1, 7, 32, 4000, 15000, 29999, 123456789)
            ORDER BY o_orderkey"""))

  /** Q136 — incremental materialized-view maintenance through the oracle
    * gate ([[graft.ops.IncrementalView.refreshDelta]]): a per-status
    * (count, sum) view bootstraps from the source versioned table, the
    * source then takes a MERGE (reprice every 100th key) and a DELETE
    * (every key ≡ 50 mod 100), and ONE delta refresh folds the CDF
    * window into the view with ZERO source scans — inserts +1, deletes
    * −1, merged additively via the exactly-once mergeBatch. The oracle
    * recomputes the view from the mutated relational state, so a missed
    * tombstone, double-applied update, or ghost group hash-fails.
    * IncrementalViewSpec pins replay, healing, and vanishing-group
    * contracts. */
  val q136 = QueryDef(
    "q136_incremental_view",
    (s, d) => {
      val tmp = Scratch.dir("q136")
      val src = tmp + "/src"; val view = tmp + "/view"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base, src, "o_orderkey")
      graft.ops.IncrementalView.refreshDelta(
        s, src, view, "ivm", Seq("o_orderstatus"), Seq("o_totalprice"))
      graft.io.VersionedTable.merge(s, src,
        base.filter(col("o_orderkey") % 100 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.1),
        Seq("o_orderkey"))
      graft.io.VersionedTable.deleteWhere(s, src, col("o_orderkey") % 100 === 50)
      graft.ops.IncrementalView.refreshDelta(
        s, src, view, "ivm", Seq("o_orderstatus"), Seq("o_totalprice"))
      graft.io.VersionedTable.read(s, view)
        .select(col("o_orderstatus"), col("cnt"),
          r4(col("sum_o_totalprice") / lit(1e6)).as("total_mm"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
                 merged AS (
                   SELECT o_orderkey, o_orderstatus,
                          CASE WHEN o_orderkey % 100 = 0
                               THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
                   FROM base WHERE o_orderkey % 100 <> 50)
            SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm
            FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q232 — incremental JOIN-view maintenance
    * ([[graft.ops.IncrementalJoinView]], the star-schema IVM rule
    * Δ(F⋈D) = ΔF⋈D_new + F_old⋈ΔD): a revenue-by-segment view over
    * orders ⋈ customer stays correct through a fact reprice, a fact
    * delete, AND a dim segment migration — all applied as ONE signed
    * delta merge, never a recompute. The oracle rebuilds the final join
    * aggregate relationally, so a double-counted cross term, a missed
    * tombstone, or a stale-dim join hash-fails.
    * IncrementalJoinViewSpec pins replay/healing/vanishing-group. */
  val q232 = QueryDef(
    "q232_incremental_join_view",
    (s, d) => {
      import graft.io.VersionedTable
      import graft.ops.IncrementalJoinView
      val tmp = Scratch.dir("q232")
      val factP = tmp + "/fact"; val dimP = tmp + "/dim"; val viewP = tmp + "/view"
      val fact = ord(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
      val dim = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      VersionedTable.commitAppend(fact, factP, "o_orderkey")
      VersionedTable.commitAppend(dim, dimP, "c_custkey")
      val spec = IncrementalJoinView.Spec(
        factP, dimP, fk = "o_custkey", dimKey = "c_custkey",
        groupCols = Seq("seg"), sumCols = Seq("o_totalprice"))
      IncrementalJoinView.refresh(s, spec, viewP, "q232") // bootstrap
      VersionedTable.merge(s, factP,
        fact.filter(col("o_orderkey") % 100 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.1),
        Seq("o_orderkey"))
      VersionedTable.deleteWhere(s, factP, col("o_orderkey") % 100 === 50)
      VersionedTable.merge(s, dimP,
        dim.filter(col("c_custkey") % 10 === 0).withColumn("seg", lit("MIGRATED")),
        Seq("c_custkey"))
      IncrementalJoinView.refresh(s, spec, viewP, "q232") // one delta merge
      VersionedTable.read(s, viewP)
        .select(col("seg"), col("cnt"),
          r4(col("sum_o_totalprice") / lit(1e6)).as("total_mm"))
        .orderBy("seg")
    },
    Some("""WITH f AS (SELECT o_custkey,
                              CASE WHEN o_orderkey % 100 = 0
                                   THEN o_totalprice * 1.1 ELSE o_totalprice END AS p
                       FROM orders WHERE o_orderkey % 100 <> 50),
                 d AS (SELECT c_custkey,
                              CASE WHEN c_custkey % 10 = 0
                                   THEN 'MIGRATED' ELSE c_mktsegment END AS seg
                       FROM customer)
            SELECT seg, COUNT(*) AS cnt,
                   ROUND(SUM(p) / 1000000.0, 4) AS total_mm
            FROM f JOIN d ON f.o_custkey = d.c_custkey
            GROUP BY seg ORDER BY seg"""))

  /** Q109 — Z-order (Morton) clustering key, the layout function behind
    * [[graft.io.Sinks.zOrderedParquet]] (multi-dimension file/row-group
    * pruning at 100 TB; ZOrderSpec asserts the locality it buys). The
    * fused [[graft.functions.InterleaveBits]] codegen expression computes
    * the z-value of (customer key, order epoch-day); the oracle recomputes
    * the interleave bit-by-bit in SQL, so a spread/mask bug in the
    * expression or its codegen hash-fails. */
  val q109 = QueryDef(
    "q109_zorder_key",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          graft.functions.InterleaveBits(
            col("o_custkey"),
            datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))).as("z"))
        .orderBy(col("z"), col("o_orderkey"))
        .limit(100),
    Some("""SELECT o_orderkey,
                   CAST(list_sum(list_transform(range(0,31),
                     i -> (((CAST(o_custkey AS BIGINT) >> i) & 1) << (2*i))
                        + (((CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) >> i) & 1) << (2*i+1)))) AS BIGINT) AS z
            FROM orders ORDER BY z, o_orderkey LIMIT 100"""))

  /** Q131 — 3-key Z-order (VERDICT r7 item 5: q109 pins the 2-key magic-
    * mask form; this pins the N-ary loop form behind the N-key
    * [[graft.io.Sinks.zOrderedParquet]]). 21 bits per dimension, bit i of
    * dim d at position 3i+d; the oracle recomputes the interleave
    * bit-by-bit in SQL including the 21-bit domain mask, so a loop-bound
    * or placement bug in [[graft.functions.InterleaveBitsN]]'s codegen
    * hash-fails. */
  val q131 = QueryDef(
    "q131_zorder3_key",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          graft.functions.InterleaveBitsN(Seq(
            col("o_custkey"),
            datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01"))),
            col("o_orderkey") % 1000)).as("z"))
        .orderBy(col("z"), col("o_orderkey"))
        .limit(100),
    Some("""SELECT o_orderkey,
                   CAST(list_sum(list_transform(range(0,21),
                     i -> ((((CAST(o_custkey AS BIGINT) & 2097151) >> i) & 1) << (3*i))
                        + ((((CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) & 2097151) >> i) & 1) << (3*i+1))
                        + ((((CAST(o_orderkey % 1000 AS BIGINT) & 2097151) >> i) & 1) << (3*i+2)))) AS BIGINT) AS z
            FROM orders ORDER BY z, o_orderkey LIMIT 100"""))

  /** Q52 — string scalar functions (SURVEY §2.8 extension set). */
  val q52 = QueryDef(
    "q52_string_funcs",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_type"), "[aeiou]", "").as("consonants"),
          levenshtein(col("p_brand"), lit("Brand#11")).as("lev"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, UPPER(p_name) AS uname,
                   CAST(LENGTH(p_name) AS INTEGER) AS name_len,
                   regexp_replace(p_type, '[aeiou]', '', 'g') AS consonants,
                   CAST(levenshtein(p_brand, 'Brand#11') AS INTEGER) AS lev
            FROM part ORDER BY p_partkey"""))

  /** Q53 — math scalar functions (SURVEY §2.8 extension set). Spark `log`
    * is natural log → DuckDB `LN` (DuckDB `log` is base-10). */
  val q53 = QueryDef(
    "q53_math_funcs",
    (s, d) =>
      li(s, d)
        .filter(col("l_orderkey") <= 100)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          r6(sqrt(col("l_extendedprice"))).as("sq"),
          r6(log(col("l_extendedprice"))).as("ln_p"),
          floor(col("l_quantity")).as("fl"),
          ceil(col("l_quantity")).as("ce"),
          r6(abs(col("l_discount") - 0.05)).as("ab"),
          r6(pow(col("l_discount"), 2)).as("pw"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
                   ROUND(SQRT(l_extendedprice),6) AS sq,
                   ROUND(LN(l_extendedprice),6) AS ln_p,
                   CAST(FLOOR(l_quantity) AS BIGINT) AS fl,
                   CAST(CEIL(l_quantity) AS BIGINT) AS ce,
                   ROUND(ABS(l_discount - 0.05),6) AS ab,
                   ROUND(POW(l_discount, 2),6) AS pw
            FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber"""))

  /** Q55 — hash functions (SURVEY §2.8 extension; backs exact dedup X1). */
  val q55 = QueryDef(
    "q55_hash_funcs",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("md5_hex"), sha2(col("text"), 256).as("sha256_hex"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
            FROM documents ORDER BY doc_id"""))

  /** Q38 — value replacement → null (ref: `?`→null repair,
    * `Cleaning.scala:31-33`, via `DataFrameNaFunctions.replace`). */
  val q38 = QueryDef(
    "q38_replace_to_null",
    (s, d) =>
      ord(s, d)
        .na.replace("o_orderpriority", Map("1-URGENT" -> null))
        .filter(col("o_orderpriority").isNull)
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT COUNT(*) AS cnt FROM orders
            WHERE NULLIF(o_orderpriority, '1-URGENT') IS NULL"""))

  /** Q39 — null-drop (ref: `df.na.drop("any", cols)`, `Cleaning.scala:92-94`). */
  val q39 = QueryDef(
    "q39_null_drop",
    (s, d) =>
      Tables.events(s, d)
        .na.drop("any", Seq("value", "user_id"))
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT COUNT(*) AS cnt FROM events
            WHERE value IS NOT NULL AND user_id IS NOT NULL"""))

  /** Q47 — interval-overlap join (SURVEY §2.3 interval row): 700-day
    * "region windows" vs 30-day order-activity intervals; classic
    * `a.start <= b.end && b.start <= a.end` predicate over a broadcast
    * small side (nested-loop stays bounded: |regions| x |orders|). */
  val q47 = QueryDef(
    "q47_interval_overlap",
    (s, d) => {
      val win = Tables.region(s, d).select(
        col("r_regionkey"),
        expr("timestamp(date_add(to_date('1995-01-01'), CAST(r_regionkey*500 AS INT)))").as("w_start"),
        expr("timestamp(date_add(to_date('1995-01-01'), CAST(r_regionkey*500 + 700 AS INT)))").as("w_end"))
      ord(s, d)
        .withColumn("o_end", col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .join(
          broadcast(win),
          col("w_start") <= col("o_end") && col("o_orderdate") <= col("w_end"))
        .groupBy("r_regionkey")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("r_regionkey")
    },
    Some("""SELECT r_regionkey, COUNT(*) AS cnt
            FROM orders JOIN region
              ON CAST(DATE '1995-01-01' + r_regionkey*500 AS TIMESTAMP) <= o_orderdate + INTERVAL 30 DAY
             AND o_orderdate <= CAST(DATE '1995-01-01' + r_regionkey*500 + 700 AS TIMESTAMP)
            GROUP BY 1 ORDER BY 1"""))

  /** Q60 — full outer join: per-nation customer vs supplier counts
    * (SURVEY §2.3 full row; unmatched sides surface as nulls). */
  val q60 = QueryDef(
    "q60_full_outer",
    (s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("c_cnt"))
      val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("s_cnt"))
      c.join(sup, Seq("nk"), "full_outer")
        .select(col("nk"), col("c_cnt"), col("s_cnt"))
        .orderBy("nk")
    },
    Some("""SELECT COALESCE(c.nk, s.nk) AS nk, c_cnt, s_cnt
            FROM (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt FROM customer GROUP BY 1) c
            FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY 1) s
              ON c.nk = s.nk
            ORDER BY nk"""))

  /** Q61 — TPC-H Q6 shape: selective filter + single aggregate; the
    * filters reach the parquet scan as PushedFilters. */
  val q61 = QueryDef(
    "q61_tpch_q6",
    (s, d) =>
      li(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
        .agg(r4(sum(col("l_extendedprice") * col("l_discount"))).as("revenue")),
    Some("""SELECT ROUND(SUM(l_extendedprice*l_discount),4) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"""),
    headline = true)

  /** Q62 — TPC-H Q3 shape: 3-way join, group, top-10 by revenue. */
  val q62 = QueryDef(
    "q62_tpch_q3",
    (s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(ord(s, d).filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(li(s, d).filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), Fmt.date(col("o_orderdate")).as("odate"))
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10),
    Some("""SELECT l_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate,
                   ROUND(SUM(l_extendedprice*(1-l_discount)),4) AS rev
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1999-01-01'
              AND l_shipdate > TIMESTAMP '1999-01-01'
            GROUP BY 1,2 ORDER BY rev DESC, l_orderkey LIMIT 10"""))

  /** Q63 — remaining analytic-function suite (SURVEY §2.5 ship list):
    * dense_rank, percent_rank, cume_dist, lead, nth_value — all derived
    * from [[graft.ops.GlobalRank]]'s distributed global row number instead
    * of a single-task `Window.orderBy`. The order (c_acctbal, c_custkey)
    * is unique (custkey is a key), so dense_rank == row_number exactly;
    * lead() is bucket-local lead + boundary stitch; the global 3rd value
    * (nth_value over an unbounded frame) is the one row with _grn = 3,
    * broadcast back to every row. */
  val q63 = QueryDef(
    "q63_analytic_suite",
    (s, d) => {
      import graft.ops.GlobalRank
      val order = Seq(col("c_acctbal"), col("c_custkey"))
      val r = GlobalRank.ranked(
        Tables.customer(s, d), col("c_acctbal"), Seq(col("c_custkey")),
        leadCol = Some("c_acctbal"))
      val third = r.filter(col("_grn") === 3).select(col("c_acctbal").as("third_bal"))
      GlobalRank.dropInternal(
        r.withColumn("dr", col("_grn").cast("int"))
          .withColumn("pr", r6(GlobalRank.percentRankExpr))
          .withColumn("cd", r6(GlobalRank.cumeDistExpr))
          .withColumn("next_bal", GlobalRank.leadExpr("c_acctbal", order))
          .join(broadcast(third), lit(true), "left"))
        .select("c_custkey", "dr", "pr", "cd", "next_bal", "third_bal")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
                   CAST(DENSE_RANK() OVER w AS INTEGER) AS dr,
                   ROUND(PERCENT_RANK() OVER w, 6) AS pr,
                   ROUND(CUME_DIST() OVER w, 6) AS cd,
                   LEAD(c_acctbal, 1) OVER w AS next_bal,
                   NTH_VALUE(c_acctbal, 3) OVER
                     (ORDER BY c_acctbal, c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_bal
            FROM customer
            WINDOW w AS (ORDER BY c_acctbal, c_custkey)
            ORDER BY c_custkey"""))

  /** Q64 — generator/explode (SURVEY §2.8 extension `explode`): top-20
    * corpus words. */
  val q64 = QueryDef(
    "q64_explode_words",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20),
    Some("""SELECT word, COUNT(*) AS cnt
            FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
            GROUP BY 1 ORDER BY cnt DESC, word LIMIT 20"""))

  /** Q65 — multiset set-ops (SURVEY §2.7: intersectAll / exceptAll). */
  val q65 = QueryDef(
    "q65_setops_all",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.intersectAll(sup).agg(count(lit(1)).as("ia_cnt"))
        .crossJoin(c.exceptAll(sup).agg(count(lit(1)).as("ea_cnt")))
    },
    Some("""SELECT
              (SELECT COUNT(*) FROM
                (SELECT c_nationkey AS nk FROM customer
                 INTERSECT ALL SELECT s_nationkey FROM supplier)) AS ia_cnt,
              (SELECT COUNT(*) FROM
                (SELECT c_nationkey AS nk FROM customer
                 EXCEPT ALL SELECT s_nationkey FROM supplier)) AS ea_cnt"""))

  /** Q69 — unpivot / melt (wide → long; the inverse of q56's pivot). */
  val q69 = QueryDef(
    "q69_unpivot",
    (s, d) =>
      li(s, d)
        .filter(col("l_orderkey") <= 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value"),
    Some("""SELECT l_orderkey, l_linenumber, name AS metric, value
            FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
                                  l_extendedprice, l_discount, l_tax
                           FROM lineitem WHERE l_orderkey <= 100)
                  ON l_quantity, l_extendedprice, l_discount, l_tax
                  INTO NAME name VALUE value)
            ORDER BY l_orderkey, l_linenumber, metric, value"""))

  /** Q70 — correlated scalar subquery through the SQL + temp-view entry
    * point (SURVEY §1.1 registerTable surface; §3.1 lifecycle): per nation,
    * customers above a fixed balance. Catalyst decorrelates this into an
    * outer join + aggregate. */
  val q70 = QueryDef(
    "q70_correlated_scalar",
    (s, d) => {
      Tables.registerFixtures(s, d)
      // the registered views carry the canonical table names, so the
      // engine runs the EXACT statement the oracle runs
      s.sql(q70Sql)
    },
    Some(q70Sql))

  private lazy val q70Sql =
    """SELECT n_name,
              (SELECT COUNT(*) FROM customer c
               WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 5000) AS rich
       FROM nation n ORDER BY n_name"""

  /** Q78 — the catalog/SQL entry surface (SURVEY §1.1; ref
    * `SQLOperations.scala:25`): [[Tables.registerFixtures]] registers every
    * fixture table as a temp view and the query is ONE portable SQL string
    * executed verbatim by both Spark and the DuckDB oracle — the switch
    * path for a reference user whose workloads are SQL statements. */
  val q78 = QueryDef(
    "q78_sql_entry",
    (s, d) => {
      Tables.registerFixtures(s, d)
      s.sql(q78Sql)
    },
    Some(q78Sql))

  private lazy val q78Sql =
    """SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN nation   ON c_nationkey = n_nationkey
       GROUP BY n_name
       ORDER BY revenue DESC, n_name"""

  /** Q71 — conditional scalar functions (SURVEY §2.8: coalesce/nullif/
    * greatest/least over nullable intermediates). */
  val q71 = QueryDef(
    "q71_conditional_funcs",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_norm"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floor_price"),
          least(col("o_totalprice"), lit(200000.0)).as("cap_price"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
                   GREATEST(o_totalprice, 100000.0) AS floor_price,
                   LEAST(o_totalprice, 200000.0) AS cap_price
            FROM orders ORDER BY o_orderkey"""))

  /** Q72 — date arithmetic (SURVEY §2.8 F-group: date_add/datediff/
    * last_day/trunc). `months_between` is deliberately absent — its
    * fractional semantics differ across engines. */
  val q72 = QueryDef(
    "q72_date_arith",
    (s, d) =>
      ord(s, d)
        .filter(col("o_orderkey") <= 200)
        .select(
          col("o_orderkey"),
          Fmt.date(date_add(col("o_orderdate"), 30)).as("due"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("age_days"),
          Fmt.date(last_day(col("o_orderdate"))).as("month_end"),
          Fmt.date(trunc(col("o_orderdate"), "quarter")).as("quarter_start"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due,
                   CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS age_days,
                   strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
                   strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS quarter_start
            FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"""))

  /** Q75 — statistical aggregates (SURVEY §2.4 extension: corr /
    * covar_samp / stddev_samp; skewness/kurtosis excluded — bias-correction
    * formulas differ across engines). Large-magnitude moments are scaled
    * before rounding per the q09 determinism note. */
  val q75 = QueryDef(
    "q75_stats_aggs",
    (s, d) =>
      li(s, d).agg(
        r6(corr(col("l_quantity"), col("l_extendedprice"))).as("qty_price_corr"),
        r6(covar_samp(col("l_quantity"), col("l_extendedprice")) / 1000.0).as("cov_k"),
        r6(stddev_samp(col("l_extendedprice")) / 1000.0).as("sd_k")),
    Some("""SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
                   ROUND(covar_samp(l_quantity, l_extendedprice)/1000.0, 6) AS cov_k,
                   ROUND(stddev_samp(l_extendedprice)/1000.0, 6) AS sd_k
            FROM lineitem"""))

  /** Q76 — additional array functions (SURVEY §2.8 `array_*` set):
    * sort/position/contains over token arrays. */
  val q76 = QueryDef(
    "q76_array_funcs",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          element_at(array_sort(split(col("text"), " ")), 1).as("first_sorted_tok"),
          array_position(split(col("text"), " "), "data").cast("int").as("data_pos"),
          array_contains(split(col("text"), " "), "spark").as("has_spark"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   list_sort(str_split(text, ' '))[1] AS first_sorted_tok,
                   CAST(COALESCE(list_position(str_split(text, ' '), 'data'), 0) AS INTEGER) AS data_pos,
                   list_contains(str_split(text, ' '), 'spark') AS has_spark
            FROM documents ORDER BY doc_id"""))

  /** Q77 — histogram via manual equal-width bucketing (floor arithmetic —
    * portable, unlike engine-specific width_bucket edge conventions). */
  val q77 = QueryDef(
    "q77_histogram",
    (s, d) => {
      val o = ord(s, d)
      val stats = o.agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(stats))
        .withColumn(
          "bucket",
          least(
            floor((col("o_totalprice") - col("mn")) / ((col("mx") - col("mn")) / 10)),
            lit(9L)).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },
    Some("""WITH s AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders)
            SELECT CAST(LEAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 10)), 9) AS INTEGER) AS bucket,
                   COUNT(*) AS cnt
            FROM orders, s GROUP BY 1 ORDER BY 1"""))

  /** Q66 — HLL++ approximate distinct (SURVEY §2.4 A6 approximate variant).
    * Sketch internals are engine-specific → rows-only; spec bounds the
    * relative error vs the exact count. */
  val q66 = QueryDef(
    "q66_approx_distinct",
    (s, d) =>
      li(s, d).agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts")),
    None)

  /** Q146 — MERGE-ON-READ merge through the oracle gate
    * ([[graft.io.VersionedTable.mergeDV]]): the SAME CDC batch as q133
    * (reprice every 100th key, delete every key ≡ 50 mod 100, insert 5
    * re-keyed rows) lands via deletion-vector tombstones + appended
    * files — ZERO existing data files rewritten (MergeDvSpec pins the
    * file accounting) — and must produce the IDENTICAL relational state
    * the copy-on-write oracle computes. A resurrected tombstone, stale
    * matched row leaking past the DV anti-join, or lost insert
    * hash-fails. */
  val q146 = QueryDef(
    "q146_merge_on_read",
    (s, d) => {
      val path = Scratch.dir("q146") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base, path, "o_orderkey")
      val updates = base.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        .withColumn("_del", lit(false))
      val deletes = base.filter(col("o_orderkey") % 100 === 50)
        .withColumn("_del", lit(true))
      val inserts = base.orderBy("o_orderkey").limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("_del", lit(false))
      graft.io.VersionedTable.mergeDV(
        s, path, updates.unionByName(deletes).unionByName(inserts),
        Seq("o_orderkey"), deleteFlag = Some("_del"))
      graft.io.VersionedTable.read(s, path)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum("o_totalprice") / lit(1e6)).as("total_mm"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
                 merged AS (
                   SELECT * FROM base
                   WHERE o_orderkey % 100 <> 0 AND o_orderkey % 100 <> 50
                   UNION ALL
                   SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1
                   FROM base WHERE o_orderkey % 100 = 0
                   UNION ALL
                   SELECT o_orderkey + 20000000, o_orderstatus, o_totalprice
                   FROM (SELECT * FROM base ORDER BY o_orderkey LIMIT 5))
            SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm,
                   MAX(o_orderkey) AS max_key
            FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q142 — CATALYST-DRIVEN file skipping ([[graft.io.VersionedTable.table]]
    * over [[graft.io.VersionedFileIndex]]): the query never names a range
    * or key — it filters the table like any DataFrame (and the same works
    * through a SQL view) and the custom FileIndex prunes files during
    * physical planning from the manifest's key ranges, the Delta/Iceberg
    * integration shape. Deletion vectors stay applied through the scan.
    * The oracle recomputes the filtered aggregate relationally;
    * VersionedTableIndexSpec pins the actual numFiles cut (range, bloom,
    * IN-list, contradiction → zero files) that this query rides. */
  val q142 = QueryDef(
    "q142_fileindex_pruned_scan",
    (s, d) => {
      val path = Scratch.dir("q142") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      // range-clustered commits so the manifest ranges are selective
      graft.io.VersionedTable.commitAppend(
        base.filter(col("o_orderkey") < 1000), path, Seq("o_orderkey"))
      graft.io.VersionedTable.commitAppend(
        base.filter(col("o_orderkey") >= 1000), path, Seq("o_orderkey"))
      graft.io.VersionedTable.deleteWhereDV(s, path, col("o_orderkey") % 10 === 0)
      graft.io.VersionedTable.table(s, path)
        .filter(col("o_orderkey").between(100, 900))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice), 4) AS total
            FROM orders
            WHERE o_orderkey BETWEEN 100 AND 900 AND o_orderkey % 10 <> 0
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q147 — the versioned table driven ENTIRELY from SQL through
    * [[graft.sources.VtCatalog]] (DSv2 TableCatalog): CREATE TABLE, two
    * INSERT INTO commits, then one statement unioning a `VERSION AS OF`
    * time-travel aggregate with the head snapshot's. The oracle
    * recomputes both snapshots relationally from `orders` (evens-only at
    * v2, everything at head), so a mis-resolved version, a lost insert,
    * or a stale snapshot read hash-fails. VtCatalogSpec covers the rest
    * of the DDL surface (overwrite, rename, checks, drop, timestamps). */
  val q147 = QueryDef(
    "q147_sql_catalog_time_travel",
    (s, d) => {
      s.conf.set("spark.sql.catalog.vtq", classOf[graft.sources.VtCatalog].getName)
      val path = Scratch.dir("q147") + "/tbl"
      ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceTempView("q147_src")
      s.sql(s"CREATE TABLE vtq.`$path` (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)")
      s.sql(s"INSERT INTO vtq.`$path` SELECT * FROM q147_src WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO vtq.`$path` SELECT * FROM q147_src WHERE o_orderkey % 2 = 1")
      s.sql(
        s"""SELECT 'head' AS snap, o_orderstatus, COUNT(*) AS cnt,
           |       ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm
           |FROM vtq.`$path` GROUP BY o_orderstatus
           |UNION ALL
           |SELECT 'v2' AS snap, o_orderstatus, COUNT(*) AS cnt,
           |       ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm
           |FROM vtq.`$path` VERSION AS OF 2 GROUP BY o_orderstatus
           |ORDER BY snap, o_orderstatus""".stripMargin)
    },
    Some("""SELECT 'head' AS snap, o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm
            FROM orders GROUP BY o_orderstatus
            UNION ALL
            SELECT 'v2' AS snap, o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm
            FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus
            ORDER BY snap, o_orderstatus"""))

  /** Q153 — RESTORE through the oracle gate
    * ([[graft.io.VersionedTable.restore]]): a delete commit (the "bad
    * batch") removes every 7th order, then the table rolls back to the
    * pre-delete snapshot as a NEW metadata-only commit — nothing
    * rewrites, the restore manifest re-references the target's files.
    * HEAD must equal the full orders table again, so a restore that
    * leaked the delete (or resurrected only part of the snapshot)
    * hash-fails against the oracle's plain full-table aggregate.
    * VersionedTableSpec pins DV/schema/stats/txn re-instatement and the
    * change-feed refusal. */
  val q153 = QueryDef(
    "q153_restore",
    (s, d) => {
      val path = Scratch.dir("q153") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base.filter(col("o_orderkey") % 2 === 0), path)
      graft.io.VersionedTable.commitAppend(base.filter(col("o_orderkey") % 2 === 1), path)
      graft.io.VersionedTable.deleteWhere(s, path, col("o_orderkey") % 7 === 0)
      graft.io.VersionedTable.restore(s, path, 2L)
      graft.io.VersionedTable.read(s, path)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum("o_totalprice") / lit(1e6)).as("total_mm"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm,
                   MAX(o_orderkey) AS max_key
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q149 — link-graph PageRank ([[graft.ops.PageRank]]): rank the
    * customer→supplier purchase graph (orders⋈lineitem, supplier ids
    * offset into their own key space) by 3 rounds of the un-normalized
    * power iteration — the link-centrality quality signal crawl curation
    * pairs with content filters. Fixed iteration count makes the result
    * pure arithmetic: the oracle UNROLLS the same three rounds in SQL
    * (recursive CTEs disallow aggregation), so a wrong out-degree, a
    * dropped dangling node, or an extra iteration hash-fails. PageRankSpec
    * pins the operator against brute force; the frozen-partitioned loop
    * (edge side shuffles once, not per round) is the [[graft.ops
    * .ConnectedComponents]] discipline. */
  val q149 = QueryDef(
    "q149_pagerank_purchase_graph",
    (s, d) => {
      val edges = ord(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(li(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(
          col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("dst"))
      graft.ops.PageRank.rank(edges, damping = 0.85, iterations = 3)
        .select(col("id"), r6(col("rank")).as("rank"))
        .orderBy("id")
    },
    Some("""WITH e AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                              CAST(l_suppkey AS BIGINT) + 1000000 AS dst
                       FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
                 outd AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
                 n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
                 p0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS r FROM n),
                 c1 AS (SELECT e.dst AS id, SUM(p0.r / outd.od) AS f
                        FROM e JOIN p0 ON p0.id = e.src
                               JOIN outd ON outd.src = e.src GROUP BY e.dst),
                 p1 AS (SELECT n.id, 0.15 + 0.85 * COALESCE(c1.f, 0) AS r
                        FROM n LEFT JOIN c1 USING (id)),
                 c2 AS (SELECT e.dst AS id, SUM(p1.r / outd.od) AS f
                        FROM e JOIN p1 ON p1.id = e.src
                               JOIN outd ON outd.src = e.src GROUP BY e.dst),
                 p2 AS (SELECT n.id, 0.15 + 0.85 * COALESCE(c2.f, 0) AS r
                        FROM n LEFT JOIN c2 USING (id)),
                 c3 AS (SELECT e.dst AS id, SUM(p2.r / outd.od) AS f
                        FROM e JOIN p2 ON p2.id = e.src
                               JOIN outd ON outd.src = e.src GROUP BY e.dst),
                 p3 AS (SELECT n.id, 0.15 + 0.85 * COALESCE(c3.f, 0) AS r
                        FROM n LEFT JOIN c3 USING (id))
            SELECT id, ROUND(r, 6) AS rank FROM p3 ORDER BY id"""))

  /** Q151 — runtime Bloom semi-join reduction ([[graft.ops.BloomJoin]]):
    * lineitem joined to a ~3%-selective orders slice, with the fact side
    * probe-filtered against a distributed-built Bloom of the dim keys
    * BEFORE the exchange — the explicit runtime-filter every warehouse
    * injects for selective joins, here stated by the caller who knows the
    * dim is a slice. Correctness gate: the join clears Bloom false
    * positives, so the result must equal the plain join — the oracle IS
    * the plain join. BloomJoinSpec pins the actual pre-exchange row cut
    * and the probe's position under the shuffle. */
  val q151 = QueryDef(
    "q151_bloom_pruned_join",
    (s, d) => {
      val fact = li(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      val dim = ord(s, d).filter(col("o_orderkey") % 37 === 0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.ops.BloomJoin.pruneAndJoin(fact, dim, Seq("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) / lit(1e6)).as("rev_mm"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(l_extendedprice * (1 - l_discount))/1000000.0, 4) AS rev_mm
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderkey % 37 = 0
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q157 — GROUPING SETS with `grouping()` disambiguation (the general
    * form behind the rollup/cube family, q24/q46): detail, per-flag
    * subtotal, and grand total in ONE pass — Spark's `Expand` operator
    * replicates rows per grouping set before a single hash aggregate, so
    * the plan is one shuffle, not three unioned scans. `COALESCE` +
    * grouping flags make subtotal rows unambiguous (and dodge cross-engine
    * NULLS FIRST/LAST defaults in the sort). */
  val q157 = QueryDef(
    "q157_grouping_sets",
    (s, d) => {
      graft.core.Tables.registerFixtures(s, d)
      s.sql("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                      COALESCE(l_linestatus, 'ALL') AS ls,
                      CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                      CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
                      COUNT(*) AS cnt,
                      ROUND(SUM(l_quantity), 4) AS sum_qty
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
               ORDER BY g_rf, g_ls, rf, ls""")
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                   COALESCE(l_linestatus, 'ALL') AS ls,
                   CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
                   CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
                   COUNT(*) AS cnt,
                   ROUND(SUM(l_quantity), 4) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
            ORDER BY g_rf, g_ls, rf, ls"""))

  /** Q163 — SCD type-2 dimension history ([[graft.ops.Scd2]]): the
    * per-customer order-status timeline collapsed to change rows with
    * [valid_from, valid_to) intervals and an is_current flag — the
    * standard warehouse versioned-dimension build, all per-key windows
    * (one shuffle on the key, nothing global). The oracle replays the
    * identical LAG-collapse + LEAD-close in SQL. */
  val q163 = QueryDef(
    "q163_scd2_history",
    (s, d) => {
      val ch = ord(s, d).filter(col("o_custkey") % 20 === 0)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"))
      graft.ops.Scd2.buildHistory(
        ch, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"),
        Seq("o_orderstatus", "o_orderpriority"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    },
    Some("""WITH ch AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus, o_orderpriority
                        FROM orders WHERE o_custkey % 20 = 0),
                 l AS (SELECT *, ROW_NUMBER() OVER w AS rn,
                              LAG(o_orderstatus) OVER w AS ps,
                              LAG(o_orderpriority) OVER w AS pp
                       FROM ch
                       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
                 c AS (SELECT * FROM l
                       WHERE rn = 1 OR ps IS DISTINCT FROM o_orderstatus
                          OR pp IS DISTINCT FROM o_orderpriority),
                 v AS (SELECT o_custkey, o_orderkey, o_orderstatus, o_orderpriority,
                              o_orderdate AS valid_from,
                              LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                                      ORDER BY o_orderdate, o_orderkey) AS valid_to
                       FROM c)
            SELECT *, valid_to IS NULL AS is_current FROM v
            ORDER BY o_custkey, valid_from, o_orderkey"""))

  /** Q164 — materialized-view AUTO-REWRITE through the oracle gate
    * ([[graft.plans.MvRewrite]] + [[graft.plans.MvRewriteRule]], injected
    * by [[graft.GraftExtensions]], VERDICT r9 item 1): a per-(returnflag,
    * linestatus) state vector is materialized once, the rule is enabled,
    * and the user's PLAIN aggregate over the lineitem scan — group-key
    * filter, subset-of-keys regroup, all five aggregate shapes — is
    * answered from the state. The `require` proves the fact scan is GONE
    * from the optimized plan (at 100 TB: one row per group read instead
    * of a full fact scan + shuffle), while the DuckDB oracle recomputes
    * everything from the raw fact — a stale, mis-merged, or
    * null-mishandling state vector hash-fails. MvRewriteSpec pins the
    * fire/decline matrix; registration state is torn down either way. */
  val q164 = QueryDef(
    "q164_mv_rewrite",
    (s, d) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val factPath = s"$d/lineitem.parquet"
      val root = Scratch.dir("q164")
      val state = root + "/state"
      graft.plans.MvRewrite.materialize(
        s, factPath, Seq("l_returnflag", "l_linestatus"), "l_quantity", state)
      s.conf.set("spark.graft.mvrewrite.enabled", "true")
      try {
        val df = s.read.parquet(factPath)
          .filter(col("l_linestatus") === "F")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            count(col("l_quantity")).as("n_qty"),
            sum("l_quantity").as("sum_qty"),
            min("l_quantity").as("min_qty"),
            max("l_quantity").as("max_qty"),
            r4(avg("l_quantity")).as("avg_qty"))
          .orderBy("l_returnflag")
        val roots = df.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        require(!roots.exists(_.endsWith("lineitem.parquet")),
          s"MV rewrite did not fire; scans: $roots")
        df.localCheckpoint(eager = true)
      } finally {
        s.conf.set("spark.graft.mvrewrite.enabled", "false")
        graft.plans.MvRewrite.clear()
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(l_quantity) AS BIGINT) AS n_qty,
                   SUM(l_quantity) AS sum_qty,
                   MIN(l_quantity) AS min_qty,
                   MAX(l_quantity) AS max_qty,
                   ROUND(AVG(l_quantity), 4) AS avg_qty
            FROM lineitem WHERE l_linestatus = 'F'
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Q165 — SQL DML lifecycle through the oracle gate
    * ([[graft.sources.VtDmlRule]], VERDICT r9 item 3): the q133 CDC batch
    * — repriced updates, tombstones, high-key inserts, tagged with an
    * `op` column — applied by `MERGE INTO ... WHEN MATCHED AND op='D'
    * THEN DELETE / UPDATE SET * / INSERT *` STATEMENT TEXT against the
    * [[graft.sources.VtCatalog]] path identifier, followed by an
    * arbitrary-predicate `DELETE FROM` (modulo — beyond the V1 filter
    * seam, so it exercises the resolution-rule path, not `SupportsDelete`)
    * and a self-referencing `UPDATE ... SET price = price * 2`
    * ([[graft.io.VersionedTable.updateWhere]]'s COW file surgery). The
    * oracle replays all three mutations relationally, so a lost survivor,
    * resurrected tombstone, double-applied update, ghost insert, or
    * mis-scoped delete/update hash-fails. VtDmlSpec pins action order,
    * leave-alone rows, and the fail-fast matrix. */
  val q165 = QueryDef(
    "q165_sql_merge_delete",
    (s, d) => {
      // fixed scratch root, deleted after eager materialization
      val root = Scratch.dir("q165")
      val path = root + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base, path, "o_orderkey")
      val updates = base.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        .withColumn("op", lit("U"))
      val deletes = base.filter(col("o_orderkey") % 100 === 50)
        .withColumn("op", lit("D"))
      val inserts = base.orderBy("o_orderkey").limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("op", lit("I"))
      updates.unionByName(deletes).unionByName(inserts)
        .createOrReplaceTempView("q165_cdc")
      s.conf.set("spark.sql.catalog.vtq165", classOf[graft.sources.VtCatalog].getName)
      s.sql(
        s"""MERGE INTO vtq165.`$path` t USING q165_cdc b
           |ON t.o_orderkey = b.o_orderkey
           |WHEN MATCHED AND b.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED AND b.op <> 'D' THEN INSERT *
           |""".stripMargin)
      s.sql(s"DELETE FROM vtq165.`$path` WHERE o_orderkey % 1000 = 7")
      s.sql(s"UPDATE vtq165.`$path` SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 1")
      try graft.io.VersionedTable.read(s, path)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum("o_totalprice") / lit(1e6)).as("total_mm"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
        .localCheckpoint(eager = true)
      finally Scratch.rmTree(new java.io.File(root))
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
                 merged AS (
                   SELECT * FROM base
                   WHERE o_orderkey % 100 <> 0 AND o_orderkey % 100 <> 50
                   UNION ALL
                   SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1
                   FROM base WHERE o_orderkey % 100 = 0
                   UNION ALL
                   SELECT o_orderkey + 20000000, o_orderstatus, o_totalprice
                   FROM (SELECT * FROM base ORDER BY o_orderkey LIMIT 5)),
                 survived AS (SELECT * FROM merged WHERE o_orderkey % 1000 <> 7),
                 final AS (
                   SELECT o_orderkey, o_orderstatus,
                          CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 1
                               THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
                   FROM survived)
            SELECT o_orderstatus, COUNT(*) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm,
                   MAX(o_orderkey) AS max_key
            FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q166 — MAINTAINED materialized view through the oracle gate (the
    * q136/q164 composition): the fact is a
    * [[graft.io.VersionedTable]], its 5-vector state
    * ([[graft.plans.MvRewrite.stateAggs]]) lives in a second versioned
    * table refreshed by [[graft.ops.IncrementalView.refreshRecompute]]
    * (touched groups only), registered via
    * [[graft.plans.MvRewrite.registerRollup]]. The fact then takes a
    * MERGE (reprice every 100th key) and a DELETE (every key ≡ 50 mod
    * 100), ONE refresh folds them in, and the user's PLAIN aggregate
    * over [[graft.io.VersionedTable.table]] is answered from the state —
    * the `require` proves the fact scan is GONE while the oracle
    * recomputes count/sum/min/max/avg from the mutation algebra, so a
    * stale group, ghost row, or mis-merged partial hash-fails. */
  val q166 = QueryDef(
    "q166_mv_maintained",
    (s, d) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val root = Scratch.dir("q166")
      val src = root + "/fact"; val view = root + "/view"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base, src, "o_orderkey")
      def refresh(): Unit = {
        graft.ops.IncrementalView.refreshRecompute(
          s, src, view, "mv166", Seq("o_orderstatus"),
          graft.plans.MvRewrite.stateAggs("o_totalprice"))
        ()
      }
      refresh()
      graft.plans.MvRewrite.registerRollup(
        s, src, Seq("o_orderstatus"), "o_totalprice", view)
      graft.io.VersionedTable.merge(s, src,
        base.filter(col("o_orderkey") % 100 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.1),
        Seq("o_orderkey"))
      graft.io.VersionedTable.deleteWhere(s, src, col("o_orderkey") % 100 === 50)
      refresh()
      s.conf.set("spark.graft.mvrewrite.enabled", "true")
      try {
        val df = graft.io.VersionedTable.table(s, src)
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("cnt"),
            r4(sum("o_totalprice") / lit(1e6)).as("total_mm"),
            r4(min("o_totalprice")).as("min_p"),
            r4(max("o_totalprice")).as("max_p"),
            r4(avg("o_totalprice") / lit(1e3)).as("avg_k"))
          .orderBy("o_orderstatus")
        val roots = df.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        require(!roots.contains(s"$src/data"),
          s"maintained-MV rewrite did not fire; scans: $roots")
        df.localCheckpoint(eager = true)
      } finally {
        s.conf.set("spark.graft.mvrewrite.enabled", "false")
        graft.plans.MvRewrite.clear()
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
                 mutated AS (
                   SELECT o_orderkey, o_orderstatus,
                          CASE WHEN o_orderkey % 100 = 0
                               THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
                   FROM base WHERE o_orderkey % 100 <> 50)
            SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS total_mm,
                   ROUND(MIN(o_totalprice), 4) AS min_p,
                   ROUND(MAX(o_totalprice), 4) AS max_p,
                   ROUND(AVG(o_totalprice)/1000.0, 4) AS avg_k
            FROM mutated GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q167 — STAR materialized-view rewrite through the oracle gate
    * ([[graft.plans.MvRewriteRule]]'s join path, VERDICT r9 "missing"
    * item 3): a per-supplier state vector over lineitem is materialized
    * once, and the user's TPC-H-Q5-shaped star query — lineitem ⋈
    * supplier ⋈ nation with a dim-side region filter, grouped by the
    * FAR dim's attribute — is answered from (state ⋈ the same dims).
    * The `require` proves the LINEITEM scan is GONE from the optimized
    * plan (at 100 TB: a supplier-sized state read joined to two dims
    * instead of a fact scan + fact-sized join), while the DuckDB oracle
    * recomputes the whole star from the raw tables — a partial
    * mis-merged across the join, a dropped dim filter, or multiplicity
    * double-count hash-fails. MvStarRewriteSpec pins the fire/decline
    * matrix (outer-join sides, non-key fact refs, dim aggregates). */
  val q167 = QueryDef(
    "q167_mv_star_rewrite",
    (s, d) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val factPath = s"$d/lineitem.parquet"
      val root = Scratch.dir("q167")
      val state = root + "/state"
      graft.plans.MvRewrite.materialize(
        s, factPath, Seq("l_suppkey"), "l_extendedprice", state)
      s.conf.set("spark.graft.mvrewrite.enabled", "true")
      try {
        val lineitem = li(s, d)
        val supplier = Tables.supplier(s, d)
        val nation = Tables.nation(s, d)
        val df = lineitem
          .join(supplier, lineitem("l_suppkey") === supplier("s_suppkey"))
          .join(nation, supplier("s_nationkey") === nation("n_nationkey"))
          .filter(nation("n_regionkey") =!= 3)
          .groupBy("n_name")
          .agg(
            count(lit(1)).as("n"),
            r4(sum("l_extendedprice") / lit(1e6)).as("rev_mm"),
            r4(avg("l_extendedprice")).as("avg_price"),
            r4(min("l_extendedprice")).as("min_price"),
            r4(max("l_extendedprice")).as("max_price"))
          .orderBy("n_name")
        val roots = df.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        require(!roots.exists(_.endsWith("lineitem.parquet")),
          s"star MV rewrite did not fire; scans: $roots")
        df.localCheckpoint(eager = true)
      } finally {
        s.conf.set("spark.graft.mvrewrite.enabled", "false")
        graft.plans.MvRewrite.clear()
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l_extendedprice)/1000000.0, 4) AS rev_mm,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(MIN(l_extendedprice), 4) AS min_price,
                   ROUND(MAX(l_extendedprice), 4) AS max_price
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_regionkey <> 3
            GROUP BY n_name ORDER BY n_name"""))

  /** Q168 — GROUPING SETS materialized-view rewrite through the oracle
    * gate ([[graft.plans.MvRewriteRule]]'s Aggregate-over-Expand path):
    * the q157-shaped grouping-sets query — detail, per-returnflag
    * subtotal, and grand total with `GROUPING()` markers — is answered
    * entirely from the q164-style per-(returnflag, linestatus) state
    * vector: the Expand's input becomes the state, partials ride through
    * every grouping set, and each aggregate re-aggregates them. The
    * `require` proves the LINEITEM scan is GONE (at 100 TB: a CUBE over
    * 6 state rows instead of three passes worth of fact scan), while the
    * DuckDB oracle recomputes every grouping set from the raw fact — a
    * subtotal served from a wrong set, a real-null key merged into a
    * rolled-up null, or a mis-riding partial hash-fails.
    * MvExpandRewriteSpec pins the fire/decline matrix. */
  val q168 = QueryDef(
    "q168_mv_grouping_sets",
    (s, d) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val factPath = s"$d/lineitem.parquet"
      val root = Scratch.dir("q168")
      val state = root + "/state"
      graft.plans.MvRewrite.materialize(
        s, factPath, Seq("l_returnflag", "l_linestatus"), "l_quantity", state)
      s.conf.set("spark.graft.mvrewrite.enabled", "true")
      try {
        graft.core.Tables.registerFixtures(s, d)
        val df = s.sql(
          """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
            |       COALESCE(l_linestatus, 'ALL') AS ls,
            |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
            |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
            |       COUNT(*) AS cnt,
            |       COUNT(l_quantity) AS cnt_q,
            |       ROUND(SUM(l_quantity), 4) AS sum_qty,
            |       MIN(l_quantity) AS min_qty,
            |       MAX(l_quantity) AS max_qty,
            |       ROUND(AVG(l_quantity), 4) AS avg_qty
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
            |ORDER BY g_rf, g_ls, rf, ls""".stripMargin)
        val roots = df.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        require(!roots.exists(_.endsWith("lineitem.parquet")),
          s"grouping-sets MV rewrite did not fire; scans: $roots")
        df.localCheckpoint(eager = true)
      } finally {
        s.conf.set("spark.graft.mvrewrite.enabled", "false")
        graft.plans.MvRewrite.clear()
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                   COALESCE(l_linestatus, 'ALL') AS ls,
                   CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
                   CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(COUNT(l_quantity) AS BIGINT) AS cnt_q,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   MIN(l_quantity) AS min_qty,
                   MAX(l_quantity) AS max_qty,
                   ROUND(AVG(l_quantity), 4) AS avg_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
            ORDER BY g_rf, g_ls, rf, ls"""))

  /** Q169 — DISTINCT-COUNT materialized view (rows-only; the sketch
    * union is an approximation and the DuckDB oracle cannot hash-match
    * an estimator, so the gate is MvSketchRewriteSpec's ≤5%-of-exact
    * tolerance matrix plus the in-query `require`s here): a per-
    * returnflag state carrying [[graft.plans.MvRewrite.stateAggsSketch]]
    * serves `hll_sketch_agg(l_partkey)` under the approx opt-in — the
    * fact scan provably GONE — and the estimates are asserted within 5%
    * of the exact distinct counts computed from the fact in the same
    * run. At 100 TB: distinct-user/distinct-document dashboards answer
    * from one sketch row per group instead of a fact-wide
    * shuffle-distinct. */
  val q169 = QueryDef(
    "q169_mv_distinct_sketch",
    (s, d) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val factPath = s"$d/lineitem.parquet"
      val root = Scratch.dir("q169")
      val state = root + "/state"
      graft.plans.MvRewrite.materializeWithSketch(
        s, factPath, Seq("l_returnflag"), "l_partkey", state)
      s.conf.set("spark.graft.mvrewrite.enabled", "true")
      s.conf.set("spark.graft.mvrewrite.approxdistinct.enabled", "true")
      try {
        val df = li(s, d)
          .groupBy("l_returnflag")
          .agg(
            hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(12)))
              .as("nd_parts"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag")
        val roots = df.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        require(!roots.exists(_.endsWith("lineitem.parquet")),
          s"sketch MV rewrite did not fire; scans: $roots")
        val result = df.localCheckpoint(eager = true)
        val exact = li(s, d).groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("nd"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        result.collect().foreach { r =>
          val (k, est) = (r.getString(0), r.getLong(1))
          require(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
            s"estimate off: k=$k est=$est exact=${exact(k)}")
        }
        result
      } finally {
        s.conf.set("spark.graft.mvrewrite.enabled", "false")
        s.conf.set("spark.graft.mvrewrite.approxdistinct.enabled", "false")
        graft.plans.MvRewrite.clear()
        Scratch.rmTree(new java.io.File(root))
      }
    },
    None)

  /** Q180 — point-in-time (PIT) lookup against the SCD2 dimension
    * ([[graft.ops.Scd2]], the consumer side of q163's history build): each
    * shipped lineitem of the tracked customers is joined to the dimension
    * version VALID AT ITS SHIP DATE — the standard "what did this
    * dimension look like when the fact happened" warehouse join. The
    * half-open validity intervals tile each key's timeline (duplicate
    * `valid_from` rows collapse to empty intervals), so every probe
    * matches exactly one version. Plan shape: equi-join on the customer
    * key with the interval predicate as a post-join filter — at 100 TB a
    * keyed shuffle join, never a cross product; the oracle rebuilds the
    * identical history + interval join in SQL. */
  val q180 = QueryDef(
    "q180_pit_scd2_join",
    (s, d) => {
      val tracked = ord(s, d).filter(col("o_custkey") % 20 === 0)
      val dim = graft.ops.Scd2.buildHistory(
        tracked.select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority")),
        Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"),
        Seq("o_orderstatus", "o_orderpriority"))
        .select(col("o_custkey").as("d_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("valid_from"), col("valid_to"))
      val probe = li(s, d)
        .join(tracked.select(col("o_orderkey").as("p_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("p_orderkey"))
        .select(col("o_custkey"), col("l_shipdate"), col("l_quantity"),
          col("l_extendedprice"))
      probe
        .join(dim,
          col("o_custkey") === col("d_custkey") &&
            col("l_shipdate") >= col("valid_from") &&
            (col("valid_to").isNull || col("l_shipdate") < col("valid_to")))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          r4(sum(col("l_quantity"))).as("sum_qty"),
          r4(sum(col("l_extendedprice"))).as("sum_price"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },
    Some("""WITH ch AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus, o_orderpriority
           |            FROM orders WHERE o_custkey % 20 = 0),
           |     l AS (SELECT *, ROW_NUMBER() OVER w AS rn,
           |                  LAG(o_orderstatus) OVER w AS ps,
           |                  LAG(o_orderpriority) OVER w AS pp
           |           FROM ch
           |           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
           |     c AS (SELECT * FROM l
           |           WHERE rn = 1 OR ps IS DISTINCT FROM o_orderstatus
           |              OR pp IS DISTINCT FROM o_orderpriority),
           |     v AS (SELECT o_custkey, o_orderstatus, o_orderpriority,
           |                  o_orderdate AS valid_from,
           |                  LEAD(o_orderdate) OVER (PARTITION BY o_custkey
           |                                          ORDER BY o_orderdate, o_orderkey) AS valid_to
           |           FROM c),
           |     probe AS (SELECT o.o_custkey, li.l_shipdate, li.l_quantity, li.l_extendedprice
           |               FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
           |               WHERE o.o_custkey % 20 = 0)
           |SELECT v.o_orderstatus, v.o_orderpriority, COUNT(*) AS n_items,
           |       ROUND(SUM(p.l_quantity), 4) AS sum_qty,
           |       ROUND(SUM(p.l_extendedprice), 4) AS sum_price
           |FROM probe p JOIN v ON p.o_custkey = v.o_custkey
           |  AND p.l_shipdate >= v.valid_from
           |  AND (v.valid_to IS NULL OR p.l_shipdate < v.valid_to)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Q189 — join planning from MANIFEST stats
    * ([[graft.ops.JoinPlanner.manifestStats]]): both join sides live in
    * versioned tables, and the planner's broadcast decision comes from
    * the row counts their manifests already record — ZERO stats scans
    * (q121/q129 pay one measuring aggregation per side; here planning
    * cost is two small JSON reads). The `require` pins the decision to
    * broadcast-right, and the oracle recomputes the join from the raw
    * tables — a stale or wrong manifest count that flipped the strategy
    * would still have to produce identical rows to pass. */
  val q189 = QueryDef(
    "q189_manifest_stats_join",
    (s, d) => {
      import graft.io.VersionedTable
      val root = Scratch.dir("q189")
      val factPath = s"$root/fact"
      val dimPath = s"$root/dim"
      VersionedTable.commitAppend(
        ord(s, d).select("o_orderkey", "o_custkey", "o_totalprice"), factPath)
      VersionedTable.commitAppend(
        Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), dimPath)
      val dimStats = graft.ops.JoinPlanner.manifestStats(s, dimPath)
      val (joined, decision) = graft.ops.JoinPlanner.autoJoin(
        VersionedTable.read(s, factPath),
        VersionedTable.read(s, dimPath),
        Seq("o_custkey"),
        broadcastMaxRows = 5000L,
        leftStats = Some(graft.ops.JoinPlanner.manifestStats(s, factPath)),
        rightStats = Some(dimStats))
      // pin that the planner FOLLOWS the manifest counts at any fixture
      // scale: under the 5000-row gate the dim broadcasts at sf<=0.01
      // (1500 rows) and correctly falls back to shuffle at sf0.1 (15000)
      val expected =
        if (dimStats.rows <= 5000L) "broadcast-right" else "shuffle"
      require(decision.strategy == expected,
        s"manifest stats mis-planned the join: $decision (dim=${dimStats.rows} rows)")
      joined
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum(col("o_totalprice")) / lit(1e6)).as("total_mm"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS cnt,
           |       ROUND(SUM(o_totalprice) / 1000000.0, 4) AS total_mm
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q197 — erasure purge across history
    * ([[graft.io.VersionedTable.purgeWhere]]): build a three-version
    * table (append evens → DV-delete every 10th key → append odds), then
    * physically purge one customer-key residue class from EVERY version,
    * and read the MIDDLE version — so the hash check proves both that the
    * purged rows are gone from history and that the rewritten deletion
    * vectors still hide exactly the rows version 2 deleted (positional
    * DVs survive the file rewrite via the position remap). The oracle
    * recomputes v2's surviving rows relationally. PurgeSpec pins the
    * physical-erasure, CDF-scrub, stats-refresh and other-rows-untouched
    * contracts. */
  val q197 = QueryDef(
    "q197_purge_history",
    (s, d) => {
      import graft.io.VersionedTable
      val path = Scratch.dir("q197") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
      VersionedTable.commitAppend(base.filter(col("o_orderkey") % 2 === 0), path, "o_orderkey")
      VersionedTable.deleteWhereDV(s, path, col("o_orderkey") % 10 === 0)
      VersionedTable.commitAppend(base.filter(col("o_orderkey") % 2 === 1), path, "o_orderkey")
      VersionedTable.purgeWhere(s, path, col("o_custkey") % 97 === 0)
      VersionedTable.read(s, path, version = Some(2L))
        .agg(
          count(lit(1)).as("cnt"),
          r4(sum(col("o_totalprice")) / lit(1e6)).as("total_mm"))
    },
    Some("""SELECT COUNT(*) AS cnt,
           |       ROUND(SUM(o_totalprice) / 1000000.0, 4) AS total_mm
           |FROM orders
           |WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 <> 0
           |  AND o_custkey % 97 <> 0""".stripMargin))

  /** Q229 — semantic version diff ([[graft.ops.VersionDiff]]): after
    * q133's CDC merge plus a follow-up DELETE, summarize what NET changed
    * between the first and last version — added / removed / changed key
    * counts and per-column change counts — from the row-level change feed
    * (cost ∝ changes, never table size; the "what happened since
    * yesterday" audit). The oracle recomputes every count relationally
    * from the same arithmetic, so a missed tombstone, a wrong
    * first/last-event ordering, or a broken null-safe column compare
    * hash-fails. */
  val q229 = QueryDef(
    "q229_version_diff",
    (s, d) => {
      import graft.io.VersionedTable
      val path = Scratch.dir("q229") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val v0 = VersionedTable.commitAppend(base, path, "o_orderkey")
      val updates = base.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        .withColumn("_del", lit(false))
      val deletes = base.filter(col("o_orderkey") % 100 === 50)
        .withColumn("_del", lit(true))
      val inserts = base.orderBy("o_orderkey").limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("_del", lit(false))
      VersionedTable.merge(
        s, path, updates.unionByName(deletes).unionByName(inserts),
        Seq("o_orderkey"), deleteFlag = Some("_del"))
      // the +20M guard keeps the window's inserts out of this delete, so
      // no key is transient and the oracle stays a pure base computation
      VersionedTable.deleteWhere(
        s, path, col("o_orderkey") % 100 === 25 && col("o_orderkey") < 20000000L)
      val v2 = VersionedTable.versions(s, path).last
      graft.ops.VersionDiff.summary(s, path, v0, v2, Seq("o_orderkey"))
    },
    Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
           |SELECT
           |  CAST((SELECT COUNT(*) FROM (SELECT * FROM base ORDER BY o_orderkey LIMIT 5))
           |       AS BIGINT) AS n_added,
           |  CAST((SELECT COUNT(*) FROM base WHERE o_orderkey % 100 IN (50, 25))
           |       AS BIGINT) AS n_removed,
           |  CAST((SELECT COUNT(*) FROM base WHERE o_orderkey % 100 = 0)
           |       AS BIGINT) AS n_changed,
           |  CAST(0 AS BIGINT) AS n_rewritten_same,
           |  CAST(0 AS BIGINT) AS chg_o_orderstatus,
           |  CAST((SELECT COUNT(*) FROM base
           |        WHERE o_orderkey % 100 = 0 AND o_totalprice * 1.1 <> o_totalprice)
           |       AS BIGINT) AS chg_o_totalprice""".stripMargin))

  /** Q249 — time travel by NAMED TAG ([[graft.io.VersionedTable.setTag]],
    * the release-ref primitive): pin "baseline" to the half-loaded table
    * and "full" after the second commit, then read BOTH states by name.
    * Tags also pin their versions against vacuum (VersionedTableTagSpec);
    * the oracle recomputes both snapshots from the raw table — q118's
    * time-travel contract, addressed by name instead of number. */
  val q249 = QueryDef(
    "q249_tag_travel",
    (s, d) => {
      val path = Scratch.dir("q249") + "/tbl"
      val base = ord(s, d).select("o_orderkey", "o_totalprice")
      graft.io.VersionedTable.commitAppend(base.filter(col("o_orderkey") % 2 === 0), path)
      graft.io.VersionedTable.setTag(s, path, "baseline", overwrite = true)
      graft.io.VersionedTable.commitAppend(base.filter(col("o_orderkey") % 2 === 1), path)
      graft.io.VersionedTable.setTag(s, path, "full", overwrite = true)
      val b = graft.io.VersionedTable.readTag(s, path, "baseline")
        .agg(count(lit(1)).as("base_cnt"), r4(sum("o_totalprice") / lit(1e6)).as("base_total_mm"))
      val f = graft.io.VersionedTable.readTag(s, path, "full")
        .agg(count(lit(1)).as("cnt"), r4(sum("o_totalprice") / lit(1e6)).as("total_mm"))
      b.crossJoin(f)
    },
    Some("""SELECT
              (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS base_cnt,
              (SELECT ROUND(SUM(o_totalprice)/1000000.0, 4) FROM orders WHERE o_orderkey % 2 = 0) AS base_total_mm,
              (SELECT COUNT(*) FROM orders) AS cnt,
              (SELECT ROUND(SUM(o_totalprice)/1000000.0, 4) FROM orders) AS total_mm"""))

  /** Q271 — referential-integrity audit across the star schema: orphan
    * foreign keys per edge (lineitem→orders, orders→customer,
    * customer→nation, lineitem→part/supplier) counted by LEFT ANTI join
    * — the data-quality sweep a warehouse runs after every load, as one
    * bounded report. Each edge is one keyed anti-join; dims broadcast
    * where small. Zero rows on a consistent fixture IS the assertion —
    * the oracle replays every NOT IN. */
  val q271 = QueryDef(
    "q271_fk_orphans",
    (s, d) => {
      def orphans(name: String, fact: org.apache.spark.sql.DataFrame, fk: String,
          dim: org.apache.spark.sql.DataFrame, pk: String) =
        fact.join(dim, fact(fk) === dim(pk), "left_anti")
          .agg(count(lit(1)).as("orphans"))
          .select(lit(name).as("edge"), col("orphans"))
      Seq(
        orphans("customer->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey"),
        orphans("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        orphans("lineitem->part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey"),
        orphans("lineitem->supplier", Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"),
        orphans("orders->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .reduce(_.unionByName(_)).orderBy("edge")
    },
    Some("""SELECT 'customer->nation' AS edge,
              (SELECT COUNT(*) FROM customer
               WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS orphans
            UNION ALL SELECT 'lineitem->orders',
              (SELECT COUNT(*) FROM lineitem
               WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
            UNION ALL SELECT 'lineitem->part',
              (SELECT COUNT(*) FROM lineitem
               WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
            UNION ALL SELECT 'lineitem->supplier',
              (SELECT COUNT(*) FROM lineitem
               WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
            UNION ALL SELECT 'orders->customer',
              (SELECT COUNT(*) FROM orders
               WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
            ORDER BY edge"""))

  /** Q277 — market-basket mining over a DATA-SIZED item space: part
    * pairs co-ordered in the same order, ranked by lift with support and
    * confidence (Agrawal & Srikant's framework). The behavioral twin
    * q201 mines the types²-BOUNDED event-type grid where every pair fits
    * in one report; here the itemset space grows with the catalog, which
    * is what forces the Apriori-style machinery: pair generation
    * self-joins the DISTINCT (order, part) projection on the order key
    * (blow-up bounded by per-basket item count, ≤7 in TPC-H — never
    * corpus-sized), min-support n_ab ≥ 2 prunes the singleton-pair tail
    * BEFORE the part joins, and the report is top-20 by (lift desc, p1,
    * p2) via TakeOrdered — every stage a keyed aggregation/join. */
  val q277 = QueryDef(
    "q277_market_basket",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val nOrders = li.select(countDistinct(col("o")).as("n_orders"))
      val pairs = li.as("a")
        .join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
      val pc = li.groupBy("p").agg(count(lit(1)).as("n_p"))
      pairs
        .join(pc.select(col("p").as("p1"), col("n_p").as("n_p1")), "p1")
        .join(pc.select(col("p").as("p2"), col("n_p").as("n_p2")), "p2")
        .crossJoin(broadcast(nOrders))
        .select(
          col("p1"), col("p2"), col("n_ab"),
          r6(col("n_ab") / col("n_orders")).as("support"),
          r6(col("n_ab") / col("n_p1")).as("confidence"),
          r6(col("n_ab").cast("double") * col("n_orders") /
            (col("n_p1").cast("double") * col("n_p2"))).as("lift"))
        .orderBy(col("lift").desc, col("p1"), col("p2"))
        .limit(20)
    },
    Some("""WITH d AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           |     n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM d),
           |     pr AS (SELECT a.p AS p1, b.p AS p2, COUNT(*) AS n_ab
           |            FROM d a JOIN d b ON a.o = b.o AND a.p < b.p
           |            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           |     pc AS (SELECT p, COUNT(*) AS n_p FROM d GROUP BY 1)
           |SELECT p1, p2, CAST(n_ab AS BIGINT) AS n_ab,
           |       ROUND(CAST(n_ab AS DOUBLE) / n_orders, 6) AS support,
           |       ROUND(CAST(n_ab AS DOUBLE) / c1.n_p, 6) AS confidence,
           |       ROUND(CAST(n_ab AS DOUBLE) * n_orders / (c1.n_p * c2.n_p), 6) AS lift
           |FROM pr JOIN pc c1 ON pr.p1 = c1.p JOIN pc c2 ON pr.p2 = c2.p
           |CROSS JOIN n
           |ORDER BY lift DESC, p1, p2 LIMIT 20""".stripMargin))

  /** Q283 — order-to-ship latency by priority: the fulfillment SLA view
    * (does 1-URGENT actually ship faster?). Lag stays whole DAYS (exact
    * ints) through the fact-fact join and into the percentile aggregate;
    * the join is keyed on the order key (both sides shuffle-partitioned
    * on it — no broadcast of a fact), and the output is one row per
    * priority. */
  val q283 = QueryDef(
    "q283_ship_lag_priority",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), to_date(col("o_orderdate")).as("odate"),
        col("o_orderpriority").as("priority"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("priority"), datediff(col("ship"), col("odate")).as("lag_d"))
        .groupBy("priority")
        .agg(
          count(lit(1)).as("n"),
          expr("percentile(lag_d, array(0.5, 0.9))").as("qs"),
          max(col("lag_d")).as("max_d"))
        .select(
          col("priority"), col("n"),
          r6(element_at(col("qs"), 1)).as("p50_d"),
          r6(element_at(col("qs"), 2)).as("p90_d"),
          col("max_d"))
        .orderBy("priority")
    },
    Some("""WITH j AS (SELECT o_orderpriority AS priority,
           |                  date_diff('day', CAST(o_orderdate AS DATE),
           |                            CAST(l_shipdate AS DATE)) AS lag_d
           |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
           |SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(quantile_cont(lag_d, 0.5), 6) AS p50_d,
           |       ROUND(quantile_cont(lag_d, 0.9), 6) AS p90_d,
           |       CAST(MAX(lag_d) AS INTEGER) AS max_d
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q284 — share-of-parent rollup: nation revenue as a fraction of its
    * region's — the hierarchy-percentage report every BI layer renders.
    * One star-join aggregation to the (region, nation) grid (dims
    * broadcast), then the share via a window over the BOUNDED aggregated
    * grid (25 rows) — the parent total is never a second scan. */
  val q284 = QueryDef(
    "q284_share_of_parent",
    (s, d) => {
      val rev = Tables.orders(s, d).select(col("o_custkey"), col("o_totalprice"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum(col("o_totalprice")).as("rev"))
      rev
        .withColumn("share",
          r6(col("rev") / sum(col("rev")).over(Window.partitionBy("region"))))
        .select(col("region"), col("nation"), r4(col("rev")).as("revenue"), col("share"))
        .orderBy("region", "nation")
    },
    Some("""WITH rev AS (SELECT r_name AS region, n_name AS nation,
           |                    SUM(o_totalprice) AS rev
           |             FROM orders
           |             JOIN customer ON o_custkey = c_custkey
           |             JOIN nation ON c_nationkey = n_nationkey
           |             JOIN region ON n_regionkey = r_regionkey
           |             GROUP BY 1, 2)
           |SELECT region, nation, ROUND(rev, 4) AS revenue,
           |       ROUND(rev / SUM(rev) OVER (PARTITION BY region), 6) AS share
           |FROM rev ORDER BY region, nation""".stripMargin))

  /** Q293 — AQE skew-join probe: the "let the engine fix it" counterpart
    * of the salting family (q99/q121/q189 fix skew in the PLAN; AQE's
    * skew-join fixes it at RUNTIME by splitting oversized shuffle
    * partitions after the map stage materializes). The query funnels 90%
    * of lineitem onto one join key, pins the join to sort-merge, lowers
    * the skew thresholds to fixture scale, and runs EAGERLY inside a
    * conf save/restore so the thresholds never leak into other queries;
    * the registry result is the collected (bounded, 5-row) aggregate.
    * PlanShapeSpec asserts the executed join actually split the hot
    * partition (`isSkewJoin`). The oracle replays the key remap + join
    * in SQL — AQE must never change RESULTS, only the partitioning. */
  val q293 = QueryDef(
    "q293_aqe_skew_join",
    (s, d) => {
      import s.implicits._
      val rows = Q293.run(s, d).map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2)))
      rows.toSeq.toDF("priority", "n", "total")
    },
    Some("""WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1
           |                       ELSE l_orderkey END AS k,
           |                  l_extendedprice AS v
           |           FROM lineitem)
           |SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(v), 4) AS total
           |FROM f JOIN orders ON k = o_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q294 — return-rate lift by brand: share of 'R' lineitems per part
    * brand against the global return rate, with the two-proportion z
    * (q269's arithmetic) flagging brands whose quality genuinely
    * deviates. One fact-dim join keyed on partkey (brand count bounded
    * ⇒ output grid bounded), one global-rate broadcast. */
  val q294 = QueryDef(
    "q294_return_rate_brand",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_partkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
      val brands = li
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"), sum(col("ret")).as("r"))
      val global = li.agg(
        count(lit(1)).as("n_all"), sum(col("ret")).as("r_all"))
      brands.crossJoin(broadcast(global))
        .select(
          col("brand"), col("n"), col("r"),
          r6(col("r") / col("n")).as("rate"),
          r6(col("r_all") / col("n_all")).as("global_rate"),
          r4((col("r") / col("n") - col("r_all") / col("n_all")) /
            sqrt((col("r_all") / col("n_all")) *
              (lit(1.0) - col("r_all") / col("n_all")) / col("n"))).as("z"))
        .orderBy("brand")
    },
    Some("""WITH li AS (SELECT l_partkey,
           |                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
           |            FROM lineitem),
           |     b AS (SELECT p_brand AS brand, COUNT(*) AS n, SUM(ret) AS r
           |           FROM li JOIN part ON l_partkey = p_partkey GROUP BY 1),
           |     g AS (SELECT COUNT(*) AS n_all, CAST(SUM(ret) AS BIGINT) AS r_all FROM li)
           |SELECT brand, CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
           |       ROUND(CAST(r AS DOUBLE) / n, 6) AS rate,
           |       ROUND(CAST(r_all AS DOUBLE) / n_all, 6) AS global_rate,
           |       ROUND((CAST(r AS DOUBLE) / n - CAST(r_all AS DOUBLE) / n_all) /
           |             SQRT((CAST(r_all AS DOUBLE) / n_all) *
           |                  (1.0 - CAST(r_all AS DOUBLE) / n_all) / n), 4) AS z
           |FROM b CROSS JOIN g ORDER BY brand""".stripMargin))

  /** Q295 — the FULL statement-text MV lifecycle
    * ([[graft.sources.VtCreateMvCommand]], VERDICT r11 item 3): the view
    * is created by `CREATE MATERIALIZED VIEW ... AS SELECT ... GROUP BY`
    * STATEMENT TEXT, and a statement-text aggregate over the same fact —
    * with a filter on a group key and a RICHER aggregate set than the
    * definition listed (the state vector serves count/sum/min/max/avg
    * alike) — is answered from the state: the plan assert proves the
    * lineitem scan is GONE. The oracle replays the aggregate over the
    * raw fact, so a wrong-state rewrite hash-fails. */
  val q295 = QueryDef(
    "q295_sql_create_mv",
    (s, d) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val factPath = s"$d/lineitem.parquet"
      val root = Scratch.dir("q295")
      val state = root + "/state"
      val created = s.sql(
        s"""CREATE MATERIALIZED VIEW `$state` AS
           |SELECT l_returnflag, l_linestatus, SUM(l_quantity)
           |FROM parquet.`$factPath` GROUP BY l_returnflag, l_linestatus""".stripMargin)
        .collect()(0)
      require(created.getAs[String]("value_col") == "l_quantity" &&
        !created.getAs[Boolean]("maintained"))
      s.conf.set("spark.graft.mvrewrite.enabled", "true")
      try {
        val df = s.sql(
          s"""SELECT l_returnflag, COUNT(*) AS n,
             |       SUM(l_quantity) AS sum_qty,
             |       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             |       ROUND(AVG(l_quantity), 4) AS avg_qty
             |FROM parquet.`$factPath` WHERE l_linestatus = 'F'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
        val roots = df.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        require(!roots.exists(_.endsWith("lineitem.parquet")),
          s"statement-created MV did not serve the statement query; scans: $roots")
        df.localCheckpoint(eager = true)
      } finally {
        s.conf.set("spark.graft.mvrewrite.enabled", "false")
        s.sql(s"DROP MATERIALIZED VIEW `$state`")
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           |       SUM(l_quantity) AS sum_qty,
           |       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           |       ROUND(AVG(l_quantity), 4) AS avg_qty
           |FROM lineitem WHERE l_linestatus = 'F'
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Q319 — STAR definitions through `CREATE MATERIALIZED VIEW`
    * (VERDICT r12 item 2): the statement takes the classic dim-joined
    * rollup — `SELECT n_name, SUM(l_extendedprice) FROM lineitem JOIN
    * supplier ON ... JOIN nation ON ... GROUP BY n_name` — and LOWERS it
    * to the fact-rollup state keyed by the fact-side join key
    * ([[graft.sources.VtCreateMvCommand.lowerStar]]: l_suppkey; the
    * dim-dim snowflake link and the dim group key contribute no state
    * keys). A statement-text star query with a dim filter and a richer
    * aggregate set is then served from that state — the plan assert
    * proves the LINEITEM scan is GONE (at 100 TB: the fact is read once
    * at CREATE, never per query; dims stay broadcast-size). The oracle
    * replays the whole star aggregate from the raw tables, so a
    * mis-keyed lowering (wrong join key, dim key leaking into the
    * state) hash-fails, not just plan-fails. */
  val q319 = QueryDef(
    "q319_sql_create_mv_star",
    (s, d) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val factPath = s"$d/lineitem.parquet"
      val suppPath = s"$d/supplier.parquet"
      val nationPath = s"$d/nation.parquet"
      val root = Scratch.dir("q319")
      val state = root + "/state"
      val created = s.sql(
        s"""CREATE MATERIALIZED VIEW `$state` AS
           |SELECT n_name, SUM(l_extendedprice)
           |FROM parquet.`$factPath`
           |JOIN parquet.`$suppPath` ON l_suppkey = s_suppkey
           |JOIN parquet.`$nationPath` ON s_nationkey = n_nationkey
           |GROUP BY n_name""".stripMargin).collect()(0)
      require(created.getAs[String]("group_cols") == "l_suppkey",
        s"star lowering must key the state by the fact-side join key, " +
          s"got: ${created.getAs[String]("group_cols")}")
      require(created.getAs[String]("value_col") == "l_extendedprice")
      s.conf.set("spark.graft.mvrewrite.enabled", "true")
      try {
        val df = s.sql(
          s"""SELECT n_name, COUNT(*) AS n,
             |       ROUND(SUM(l_extendedprice) / 1000000.0, 4) AS rev_mm,
             |       ROUND(AVG(l_extendedprice), 4) AS avg_price,
             |       ROUND(MIN(l_extendedprice), 4) AS min_price,
             |       ROUND(MAX(l_extendedprice), 4) AS max_price
             |FROM parquet.`$factPath`
             |JOIN parquet.`$suppPath` ON l_suppkey = s_suppkey
             |JOIN parquet.`$nationPath` ON s_nationkey = n_nationkey
             |WHERE n_regionkey <> 3
             |GROUP BY n_name ORDER BY n_name""".stripMargin)
        val roots = df.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        require(!roots.exists(_.endsWith("lineitem.parquet")),
          s"SQL-created star MV did not serve the star query; scans: $roots")
        df.localCheckpoint(eager = true)
      } finally {
        s.conf.set("spark.graft.mvrewrite.enabled", "false")
        s.sql(s"DROP MATERIALIZED VIEW `$state`")
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(l_extendedprice)/1000000.0, 4) AS rev_mm,
           |       ROUND(AVG(l_extendedprice), 4) AS avg_price,
           |       ROUND(MIN(l_extendedprice), 4) AS min_price,
           |       ROUND(MAX(l_extendedprice), 4) AS max_price
           |FROM lineitem
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE n_regionkey <> 3
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Q325 — co-bucketed versioned-table join
    * ([[graft.io.VersionedTable.commitBucketed]]): lineitem and orders
    * land once each as hash-bucketed tables on the order key, and the
    * fact-to-fact join then plans with ZERO exchanges — REQUIREd on the
    * executed (post-AQE) plan, broadcast disabled so the assert can't be
    * satisfied by a broadcast instead. At 100 TB this is THE join
    * economics lever: the shuffle is paid once at ingest (when the data
    * moves anyway), not per query. The oracle replays join + rollup from
    * the raw fixtures — bucketing is layout-only, so any row lost or
    * duplicated by the bucket plumbing (misassigned file, dropped empty
    * bucket, suffix misparse) hash-fails. */
  val q325 = QueryDef(
    "q325_bucketed_join",
    (s, d) => {
      val root = Scratch.dir("q325")
      val bcWas = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = root + "/li"; val ord = root + "/ord"
        graft.io.VersionedTable.commitBucketed(
          Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
          li, "l_orderkey", 16)
        graft.io.VersionedTable.commitBucketed(
          Tables.orders(s, d).select(
            col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
          ord, "l_orderkey", 16)
        val joined = graft.io.VersionedTable.table(s, li)
          .join(graft.io.VersionedTable.table(s, ord), "l_orderkey")
        requireJoinExchangeFree(
          joined
            .groupBy("o_orderpriority")
            .agg(
              count(lit(1)).as("n"),
              r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) / 1e6)
                .as("rev_mm"))
            .orderBy("o_orderpriority"),
          "q325:")
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)) / 1000000.0, 4)
           |         AS rev_mm
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Q335 — the bucketing claim SURVIVES table maintenance
    * ([[graft.io.VersionedTable.deleteWhere]]/[[graft.io.VersionedTable.compact]]
    * re-stage rewritten files through the bucketed writer, r14): two
    * bucketed appends, a predicate delete, and a small-file compaction
    * later, the fact-to-fact join STILL plans with zero exchanges —
    * REQUIREd on the executed plan with broadcast disabled. Without
    * claim preservation, one routine delete on a 100 TB bucketed fact
    * table silently re-imposes the full join shuffle on every
    * subsequent query until a manual re-bucket. The oracle replays
    * join + rollup from the raw fixtures with the delete as a WHERE
    * clause — any survivor row lost or duplicated by the bucketed
    * rewrite hash-fails. */
  val q335 = QueryDef(
    "q335_bucketed_maintenance_join",
    (s, d) => {
      val root = Scratch.dir("q335")
      val bcWas = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = root + "/li"; val ord = root + "/ord"
        val liRows = Tables.lineitem(s, d)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        // two bucketed appends → >1 file per bucket → compact has work
        graft.io.VersionedTable.commitBucketed(
          liRows.filter(col("l_orderkey") % 2 === 0), li, "l_orderkey", 16)
        graft.io.VersionedTable.commitBucketed(
          liRows.filter(col("l_orderkey") % 2 =!= 0), li, "l_orderkey", 16)
        graft.io.VersionedTable.commitBucketed(
          Tables.orders(s, d).select(
            col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
          ord, "l_orderkey", 16)
        // maintenance: delete the high-discount rows, then repack — the
        // claim must survive BOTH rewrites
        graft.io.VersionedTable.deleteWhere(s, li, col("l_discount") > 0.05)
        graft.io.VersionedTable.compact(s, li, targetRowsPerFile = 10000000L)
        require(graft.io.VersionedTable.bucketing(s, li).contains(("l_orderkey", 16)),
          "maintenance dropped the bucketing claim")
        val joined = graft.io.VersionedTable.table(s, li)
          .join(graft.io.VersionedTable.table(s, ord), "l_orderkey")
        requireJoinExchangeFree(
          joined
            .groupBy("o_orderpriority")
            .agg(
              count(lit(1)).as("n"),
              r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) / 1e6)
                .as("rev_mm"))
            .orderBy("o_orderpriority"),
          "q335 post-maintenance:")
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)) / 1000000.0, 4)
           |         AS rev_mm
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE NOT (l_discount > 0.05)
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    headline = true)

  /** Q338 — MV rewrite OVER a bucketed fact (VERDICT r13 item 7): the
    * two layout levers compose instead of colliding. One bucketed fact
    * (order-key layout) carries a maintained rollup state keyed by the
    * star join key; then (a) a star query grouped by nation is served
    * from the STATE (plan-asserted: no fact root in the optimized scan
    * set) — the MV lever; (b) an order-key aggregation is a base-table
    * MISS the view must NOT serve (asserted), and the BucketSpec scan
    * plans it with ZERO exchanges — the bucket lever. At 100 TB the
    * composition means dim-rollups cost one state read while bucket-key
    * work still never shuffles; a rewrite that matched only unbucketed
    * scans, or a BucketSpec lost under the MV machinery, fails the
    * REQUIREs. The oracle replays the star rollup from the raw fixtures
    * with the miss-side totals folded in (any row lost by the bucketed
    * ingest or double-counted by the rewrite hash-fails). */
  val q338 = QueryDef(
    "q338_mv_over_bucketed_fact",
    (s, d) => {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val root = Scratch.dir("q338")
      val fact = root + "/fact"; val view = root + "/view"
      graft.io.VersionedTable.commitBucketed(
        Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice"),
        fact, "l_orderkey", 16)
      graft.ops.IncrementalView.refreshRecompute(
        s, fact, view, "q338-mv", Seq("l_suppkey"),
        graft.plans.MvRewrite.stateAggs("l_extendedprice"))
      val mv = graft.plans.MvRewrite.registerRollup(
        s, fact, Seq("l_suppkey"), "l_extendedprice", view)
      val flagWas = s.conf.getOption("spark.graft.mvrewrite.enabled")
      s.conf.set("spark.graft.mvrewrite.enabled", "true")
      try {
        def walk(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
          case other => other +: other.children.flatMap(walk)
        }
        def roots(df: DataFrame): Seq[String] = df.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        // (b) bucket-key aggregation: a base-table MISS (l_orderkey is
        // not a view key) that must scan the FACT and plan shuffle-free
        val miss = graft.io.VersionedTable.table(s, fact)
          .groupBy("l_orderkey").agg(sum(col("l_extendedprice")).as("rev"))
        miss.write.format("noop").mode("overwrite").save()
        require(roots(miss).exists(_.contains("/fact/data")),
          s"the bucket-key miss must scan the fact, got: ${roots(miss)}")
        val nShuffles = walk(miss.queryExecution.executedPlan)
          .count(_.isInstanceOf[ShuffleExchangeExec])
        require(nShuffles == 0,
          s"bucket-key aggregation must plan exchange-free over the BucketSpec " +
            s"scan, got $nShuffles:\n${miss.queryExecution.executedPlan}")
        // (a) the star rollup: served from the STATE, not the fact
        val star = graft.io.VersionedTable.table(s, fact)
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            count(lit(1)).as("n"),
            r4(sum(col("l_extendedprice")) / 1e6).as("rev_mm"),
            r4(avg(col("l_extendedprice"))).as("avg_price"))
        require(!roots(star).exists(_.contains("/fact/data")),
          s"the star rollup must be served from the MV state, scans: ${roots(star)}")
        star.orderBy("n_name").localCheckpoint(eager = true)
      } finally {
        flagWas match {
          case Some(v) => s.conf.set("spark.graft.mvrewrite.enabled", v)
          case None => s.conf.set("spark.graft.mvrewrite.enabled", "false")
        }
        graft.plans.MvRewrite.unregister(mv.stateId)
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(l_extendedprice)/1000000.0, 4) AS rev_mm,
           |       ROUND(AVG(l_extendedprice), 4) AS avg_price
           |FROM lineitem
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Q344 — bucket pruning on a bucket-key point lookup (VERDICT r14
    * item 3): a claimed table knows key → murmur3 bucket, so
    * `key = lit` must OPEN one bucket's files, not all 16 — the point-
    * lookup win that makes a claimed 100 TB fact serve single-key
    * queries at 1/n of the I/O with zero index structures. Spark's own
    * FileSourceStrategy derives the bucket set from the equality filter
    * over [[graft.io.VersionedTable.table]]'s attached BucketSpec; the
    * REQUIRE reads the executed FilePartitions (what tasks actually
    * open — the `numFiles` metric is set BEFORE the cut) and pins every
    * opened file to [[graft.io.VersionedTable.bucketIdOf]]'s bucket.
    * The oracle replays the lookup's aggregate over the raw fixture, so
    * a cut that dropped the wrong files (or a hash drifting from the
    * writer's) loses rows and hash-fails. */
  val q344 = QueryDef(
    "q344_bucket_point_lookup",
    (s, d) => {
      val root = Scratch.dir("q344")
      try {
        val li = root + "/li"
        graft.io.VersionedTable.commitBucketed(
          Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_extendedprice"),
          li, "l_orderkey", 16)
        val key = Tables.lineitem(s, d)
          .agg(min(col("l_orderkey"))).head().getLong(0)
        val q = graft.io.VersionedTable.table(s, li)
          .filter(col("l_orderkey") === key)
        q.write.format("noop").mode("overwrite").save()
        def walk(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
          case qe: org.apache.spark.sql.execution.adaptive.QueryStageExec => qe +: walk(qe.plan)
          case other => other +: other.children.flatMap(walk)
        }
        val opened = walk(q.queryExecution.executedPlan)
          .collect { case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc }
          .flatMap(_.inputRDD.partitions.toSeq.flatMap[String] {
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.map(f => new java.net.URI(f.urlEncodedPath).getPath)
            case _ => Seq.empty
          })
        val expected = graft.io.VersionedTable.bucketIdOf(
          key, org.apache.spark.sql.types.LongType, 16)
        val suffix = "_(\\d+)\\.".r
        require(opened.nonEmpty &&
          opened.forall(f => suffix.findFirstMatchIn(f.split("/").last)
            .exists(_.group(1).toInt == expected)),
          s"point lookup on the claimed key must open only bucket $expected's " +
            s"files, opened: ${opened.map(_.split("/").last).mkString(", ")}")
        q.groupBy("l_orderkey")
          .agg(
            count(lit(1)).as("n"),
            r4(sum(col("l_quantity"))).as("sum_qty"),
            r4(sum(col("l_extendedprice"))).as("sum_price"))
          .localCheckpoint(eager = true)
      } finally Scratch.rmTree(new java.io.File(root))
    },
    Some("""SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(l_quantity), 4) AS sum_qty,
           |       ROUND(SUM(l_extendedprice), 4) AS sum_price
           |FROM lineitem
           |WHERE l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem)
           |GROUP BY l_orderkey""".stripMargin))

  /** Q345 — COMPOSITE-key co-bucketed join (VERDICT r14 item 4): two
    * facts whose natural co-location key is the PAIR (l_partkey,
    * l_suppkey) — the partsupp shape — bucketed on the tuple via
    * [[graft.io.VersionedTable.commitBucketed]]'s Seq overload, joined
    * on the full key with ZERO exchanges (REQUIREd on the executed plan,
    * broadcast disabled). Before r15 a composite key couldn't use the
    * claim at all; now the claim string comma-joins the keys, the scan
    * attaches the multi-column BucketSpec, and every maintenance guard
    * checks each key. The oracle replays the same filtered self-join
    * from the raw fixture, so a tuple-hash mismatch between the two
    * writers (or a misgrouped bucket) loses join matches and
    * hash-fails. */
  val q345 = QueryDef(
    "q345_composite_bucket_join",
    (s, d) => {
      val root = Scratch.dir("q345")
      val bcWas = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val ta = root + "/a"; val tb = root + "/b"
        val li = Tables.lineitem(s, d)
        graft.io.VersionedTable.commitBucketed(
          li.filter(col("l_orderkey") % 2 === 0)
            .select("l_partkey", "l_suppkey", "l_quantity"),
          ta, Seq("l_partkey", "l_suppkey"), 16)
        graft.io.VersionedTable.commitBucketed(
          li.filter(col("l_orderkey") % 2 =!= 0)
            .select("l_partkey", "l_suppkey", "l_extendedprice"),
          tb, Seq("l_partkey", "l_suppkey"), 16)
        require(graft.io.VersionedTable.bucketing(s, ta)
          .contains(("l_partkey,l_suppkey", 16)), "composite claim missing")
        val joined = graft.io.VersionedTable.table(s, ta)
          .join(graft.io.VersionedTable.table(s, tb), Seq("l_partkey", "l_suppkey"))
        requireJoinExchangeFree(
          joined
            .groupBy((col("l_partkey") % 10).as("pk_mod"))
            .agg(
              count(lit(1)).as("n"),
              r4(sum(col("l_quantity"))).as("sum_qty"),
              r4(sum(col("l_extendedprice")) / 1e6).as("sum_price_mm"))
            .orderBy("pk_mod"),
          "q345 composite:")
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""WITH a AS (SELECT l_partkey, l_suppkey, l_quantity
           |           FROM lineitem WHERE l_orderkey % 2 = 0),
           |     b AS (SELECT l_partkey, l_suppkey, l_extendedprice
           |           FROM lineitem WHERE l_orderkey % 2 <> 0)
           |SELECT l_partkey % 10 AS pk_mod, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(l_quantity), 4) AS sum_qty,
           |       ROUND(SUM(l_extendedprice) / 1000000.0, 4) AS sum_price_mm
           |FROM a JOIN b USING (l_partkey, l_suppkey)
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Q347 — incremental claim recovery under the oracle gate
    * ([[graft.io.VersionedTable.rebucket]], VERDICT r14 item 8): a
    * bucketed fact takes the fat-fingered plain append that drops the
    * claim, then `rebucket` restores it by rewriting ONLY the appended
    * tail — REQUIREd: all 16 claimed-era files carry by reference
    * (filesCarried == 16), at least one tail file rewrites, and the
    * co-bucketed join plans with ZERO exchanges again (broadcast
    * disabled). The aggregate then oracle-compares against the raw
    * fixture join, so a recovery that lost or duplicated tail rows —
    * or re-staged them into wrong buckets (the join would drop their
    * matches) — hash-fails. */
  val q347 = QueryDef(
    "q347_rebucket_recovery_join",
    (s, d) => {
      val root = Scratch.dir("q347")
      val bcWas = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = root + "/li"; val ord = root + "/ord"
        val liRows = Tables.lineitem(s, d)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        graft.io.VersionedTable.commitBucketed(
          liRows.filter(col("l_orderkey") % 2 === 0), li, "l_orderkey", 16)
        graft.io.VersionedTable.commitBucketed(
          Tables.orders(s, d).select(
            col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
          ord, "l_orderkey", 16)
        // the fat-fingered plain append: the odd half lands unbucketed
        graft.io.VersionedTable.commitAppend(
          liRows.filter(col("l_orderkey") % 2 =!= 0), li)
        require(graft.io.VersionedTable.bucketing(s, li).isEmpty,
          "a plain append must drop the claim")
        val res = graft.io.VersionedTable.rebucket(s, li)
        require(res.filesCarried == 16,
          s"all claimed-era bucket files must carry by reference: $res")
        require(res.filesRewritten >= 1, s"the appended tail must rewrite: $res")
        require(graft.io.VersionedTable.bucketing(s, li)
          .contains(("l_orderkey", 16)), "rebucket must restore the claim")
        val joined = graft.io.VersionedTable.table(s, li)
          .join(graft.io.VersionedTable.table(s, ord), "l_orderkey")
        requireJoinExchangeFree(
          joined
            .groupBy("o_orderpriority")
            .agg(
              count(lit(1)).as("n"),
              r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) / 1e6)
                .as("rev_mm"))
            .orderBy("o_orderpriority"),
          "q347 post-rebucket:")
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)) / 1000000.0, 4)
           |         AS rev_mm
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    headline = true)

  /** Q364 — bucket-count evolution through the oracle gate
    * ([[graft.io.VersionedTable.rebucketInto]], VERDICT r15 item 5): a
    * fact laid out at 8 buckets grows to 16 via the per-bucket LOCAL
    * split (murmur3 mod 16 refines mod 8 — the result asserts the local
    * path ran), then joins a 16-bucketed partner; the executed plan must
    * show ZERO exchanges (asserted on the SAME plan the query ran) and
    * the aggregate must equal the oracle's plain relational join. A
    * wrong child placement surfaces as lost/duplicated join rows —
    * hash-fail; BucketEvolveSpec pins the per-file refinement, version
    * file-identity, composite keys, the full-rewrite fallback, and the
    * SQL statement. */
  val q364 = QueryDef(
    "q364_bucket_double_join",
    (s, d) => {
      val root = Scratch.dir("q364")
      val bcWas = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = root + "/li"; val ord = root + "/ord"
        graft.io.VersionedTable.commitBucketed(
          Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
          li, "l_orderkey", 8)
        graft.io.VersionedTable.commitBucketed(
          Tables.orders(s, d).select(
            col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
          ord, "l_orderkey", 16)
        val res = graft.io.VersionedTable.rebucketInto(s, li, 16)
        require(res.local, s"8 -> 16 must take the per-bucket local path: $res")
        require(graft.io.VersionedTable.bucketing(s, li)
          .contains(("l_orderkey", 16)), "the grown claim must hold")
        val joined = graft.io.VersionedTable.table(s, li)
          .join(graft.io.VersionedTable.table(s, ord), "l_orderkey")
        requireJoinExchangeFree(
          joined
            .groupBy("o_orderpriority")
            .agg(
              count(lit(1)).as("n"),
              r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) / 1e6)
                .as("rev_mm"))
            .orderBy("o_orderpriority"),
          "q364 post-growth:")
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
        Scratch.rmTree(new java.io.File(root))
      }
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)) / 1000000.0, 4)
           |         AS rev_mm
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  def all: Seq[QueryDef] = Seq(
    q271, q277, q283, q284, q293, q294, q295, q319, q325, q335, q338, q344, q345, q347,
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q15,
    q16, q17, q18, q18b, q18c, q23, q24, q25, q38, q39, q41, q42, q46, q47,
    q48, q50, q52, q53, q55, q60, q61, q62, q63, q64, q65, q66, q69, q70,
    q71, q72, q75, q76, q77, q78, q81, q82, q91, q94, q100, q109, q118, q131, q132, q133,
    q134, q135, q136, q142, q146, q147, q149, q151, q153, q157, q163, q164, q165, q166,
    q167, q168, q169, q180, q189, q197, q229, q232, q249, q363, q364, q367, q368,
    q371, q376)
}

/** q293's eager skew-join execution, shared with PlanShapeSpec (which
  * asserts the runtime split on the SAME plan the query ran). Conf
  * save/restore keeps the fixture-scale skew thresholds and the
  * disabled broadcast from leaking into the session's other queries. */
private[graft] object Q293 {
  import org.apache.spark.sql.{Row, SparkSession}
  import org.apache.spark.sql.functions._

  def run(s: SparkSession, d: String): Array[Row] = runWithPlan(s, d)._1

  def runWithPlan(s: SparkSession, d: String): (Array[Row], String) = {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set(keys(0), "2")
      s.conf.set(keys(1), "1kb")
      s.conf.set(keys(2), "1kb")
      s.conf.set(keys(3), "-1") // pin to sort-merge: skew-split is SMJ-side
      // the skew split's unit is a MAP output chunk — a single-file scan
      // feeds the shuffle from ONE mapper and the hot partition becomes
      // unsplittable, so spread the map side first (at cluster scale the
      // scan already has thousands of mappers; the fixture needs help)
      val fact = graft.core.Tables.lineitem(s, d).select(
        when(col("l_orderkey") % 10 < 9, lit(1L))
          .otherwise(col("l_orderkey")).as("k"),
        col("l_extendedprice").as("v"))
        .repartition(16)
      val dim = graft.core.Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderpriority").as("priority"))
      val joined = fact.join(dim, "k")
        .groupBy("priority")
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 4).as("total"))
        .orderBy("priority")
      val rows = joined.collect()
      (rows, joined.queryExecution.executedPlan.toString)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
