package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Fmt.{r4, r6}
import graft.core.Tables

/** Statistical-profiling operators: correlation matrices, equi-depth
  * discretization, robust (MAD) outlier detection, Pareto frontiers.
  * The reference's statistical surface stops at variance / IQR bounds
  * (`Cleaning.scala:124-139`); these are the next operators an analyst
  * reaches for, each built on the same exact-percentile / keyed-agg
  * machinery and each oracle-checked.
  */
object Stats {

  private val num = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Q193 — pairwise Pearson correlation of the lineitem measures in ONE
    * aggregation pass: all six `corr` aggregates share a single scan and
    * a single partial/final exchange (vs one job per pair in naive
    * profilers). */
  val q193 = QueryDef(
    "q193_correlation_matrix",
    (s, d) => {
      val pairs = num.combinations(2).toSeq
      val aggs = pairs.map { case Seq(a, b) =>
        r4(corr(col(a), col(b))).as(s"corr_${short(a)}_${short(b)}")
      }
      Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
    },
    Some {
      val pairs = num.combinations(2).toSeq
      val cols = pairs.map { case Seq(a, b) =>
        s"ROUND(corr($a, $b), 4) AS corr_${short(a)}_${short(b)}"
      }
      s"SELECT ${cols.mkString(", ")} FROM lineitem"
    })

  private def short(c: String): String = c.stripPrefix("l_")

  /** Q194 — equi-depth discretization: exact decile boundaries of
    * `l_quantity` (one `percentile` aggregate), then a bucket-count pass
    * where each row's bin is "number of boundaries strictly below it",
    * computed against the broadcast 1-row boundary table with a
    * higher-order `aggregate` over the array — no per-boundary join, no
    * window. Two scans total; the boundary "table" is nine doubles. */
  val q194 = QueryDef(
    "q194_equidepth_bins",
    (s, d) => {
      val li = Tables.lineitem(s, d).select("l_quantity")
      val taus = (1 to 9).map(_ / 10.0)
      val bounds = li.agg(
        expr(s"percentile(l_quantity, array(${taus.mkString(",")}))").as("qs"))
      li.crossJoin(broadcast(bounds))
        .select(expr(
          "CAST(aggregate(qs, 0, (acc, q) -> acc + IF(l_quantity > q, 1, 0)) AS BIGINT)")
          .as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bin")
    },
    Some("""WITH b AS (SELECT quantile_cont(l_quantity,
           |                    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
           |           FROM lineitem)
           |SELECT CAST(len(list_filter(b.qs, q -> lineitem.l_quantity > q)) AS BIGINT) AS bin,
           |       COUNT(*) AS cnt
           |FROM lineitem, b
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q195 — robust per-type outlier audit via [[graft.ops.RobustStats]]:
    * median, MAD, and the count of events beyond 3 MADs — the scale
    * estimate the z-score monitor (q156) can't provide once outliers
    * contaminate the variance. */
  val q195 = QueryDef(
    "q195_mad_outliers",
    (s, d) =>
      graft.ops.RobustStats
        .madOutliers(Tables.events(s, d), "event_type", "value", k = 3.0)
        .select(
          col("event_type"),
          r4(col("med")).as("med"),
          r4(col("mad")).as("mad"),
          col("outliers"))
        .orderBy("event_type"),
    Some("""WITH m AS (SELECT event_type, median(value) AS med
           |           FROM events GROUP BY 1),
           |     d AS (SELECT e.event_type, m.med, ABS(e.value - m.med) AS ad
           |           FROM events e JOIN m USING (event_type)),
           |     md AS (SELECT event_type, median(ad) AS mad FROM d GROUP BY 1)
           |SELECT d.event_type,
           |       ROUND(ANY_VALUE(d.med), 4) AS med,
           |       ROUND(ANY_VALUE(md.mad), 4) AS mad,
           |       COUNT(*) FILTER (WHERE d.ad > 3 * md.mad) AS outliers
           |FROM d JOIN md USING (event_type)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q196 — Pareto frontier of customers on (order count, best single
    * order) via [[graft.ops.Skyline]]: the oracle is the quadratic
    * NOT-EXISTS dominance test; the engine shape is two bounded
    * aggregates + a broadcast join (see Skyline's scaladoc). */
  val q196 = QueryDef(
    "q196_skyline_customers",
    (s, d) => {
      val per = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          count(lit(1)).as("n_orders"),
          max(col("o_totalprice")).as("best_price"))
      graft.ops.Skyline.maxMax2D(per, "n_orders", "best_price")
        .select("o_custkey", "n_orders", "best_price")
        .orderBy("o_custkey")
    },
    Some("""WITH per AS (SELECT o_custkey, COUNT(*) AS n_orders,
           |                    MAX(o_totalprice) AS best_price
           |             FROM orders GROUP BY 1)
           |SELECT a.o_custkey, a.n_orders, a.best_price
           |FROM per a
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM per b
           |  WHERE b.n_orders >= a.n_orders AND b.best_price >= a.best_price
           |    AND (b.n_orders > a.n_orders OR b.best_price > a.best_price))
           |ORDER BY a.o_custkey""".stripMargin),
    headline = true)

  /** Q198 — per-key trend: OLS slope/intercept of daily event volume via
    * the `regr_slope`/`regr_intercept` aggregates over the BOUNDED daily
    * grid (calendar × event types) — the cheap "is this source growing or
    * dying" monitor. One keyed aggregation to build the grid, one over
    * it. */
  val q198 = QueryDef(
    "q198_trend_per_type",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("x", datediff(col("day"), lit("1970-01-01").cast("date")))
      daily.groupBy("event_type")
        .agg(
          r4(expr("regr_slope(cnt, x)")).as("slope"),
          r4(expr("regr_intercept(cnt, x)")).as("intercept"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type,
           |       ROUND(regr_slope(cnt, datediff('day', DATE '1970-01-01', day)), 4) AS slope,
           |       ROUND(regr_intercept(cnt, datediff('day', DATE '1970-01-01', day)), 4) AS intercept,
           |       COUNT(*) AS n_days
           |FROM daily GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q199 — Benford first-digit audit: observed share of each leading
    * significant digit of `o_totalprice` against the Benford expectation
    * log10(1 + 1/d) — the classic fabricated-data screen. One narrow
    * digit expression, one 9-row aggregate, one broadcast total. */
  val q199 = QueryDef(
    "q199_benford_audit",
    (s, d) => {
      val digits = Tables.orders(s, d)
        .filter(col("o_totalprice") > 0)
        .select(floor(col("o_totalprice") /
          pow(lit(10.0), floor(log10(col("o_totalprice"))))).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("cnt"))
      val total = digits.agg(sum(col("cnt")).as("tot"))
      digits.crossJoin(broadcast(total))
        .select(
          col("digit"),
          col("cnt"),
          r4(col("cnt") / col("tot")).as("share"),
          r4(log10(lit(1) + lit(1.0) / col("digit"))).as("benford"))
        .orderBy("digit")
    },
    Some("""WITH g AS (
           |  SELECT CAST(FLOOR(o_totalprice / POWER(10, FLOOR(LOG10(o_totalprice)))) AS BIGINT) AS digit,
           |         COUNT(*) AS cnt
           |  FROM orders WHERE o_totalprice > 0 GROUP BY 1),
           |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM g)
           |SELECT g.digit, g.cnt,
           |       ROUND(g.cnt * 1.0 / t.tot, 4) AS share,
           |       ROUND(LOG10(1 + 1.0 / g.digit), 4) AS benford
           |FROM g, t ORDER BY g.digit""".stripMargin))

  /** Q200 — CUSUM change-point per event type: the day where the
    * cumulative deviation of daily volume from the type's mean peaks.
    * The statistic is computed in EXACT integer arithmetic — scale the
    * classic cusum_i = S_i − i·T/n by n to C_i = n·S_i − i·T (S_i =
    * running count sum, T = total, n = #days) — so the argmax cannot
    * drift across engines on floating-point summation order. All windows
    * run per event type over the bounded daily grid. */
  val q200 = QueryDef(
    "q200_cusum_changepoint",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val stepped = daily
        .withColumn("i", row_number().over(w))
        .withColumn("s", sum(col("cnt")).over(w))
      val totals = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("tot"))
      val scored = stepped.join(broadcast(totals), "event_type")
        .withColumn("c", abs(col("n") * col("s") - col("i") * col("tot")).cast("long"))
      val pick = Window.partitionBy("event_type").orderBy(col("c").desc, col("day"))
      scored.withColumn("rn", row_number().over(pick))
        .filter(col("rn") === 1)
        .select(
          col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("c").as("max_cusum"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |w AS (
           |  SELECT event_type, day,
           |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
           |         SUM(cnt) OVER (PARTITION BY event_type ORDER BY day) AS s
           |  FROM daily),
           |t AS (SELECT event_type, COUNT(*) AS n, SUM(cnt) AS tot
           |      FROM daily GROUP BY 1),
           |c AS (
           |  SELECT w.event_type, w.day,
           |         CAST(ABS(t.n * w.s - w.i * t.tot) AS BIGINT) AS c,
           |         ROW_NUMBER() OVER (PARTITION BY w.event_type
           |                            ORDER BY ABS(t.n * w.s - w.i * t.tot) DESC, w.day) AS rn
           |  FROM w JOIN t USING (event_type))
           |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c AS max_cusum
           |FROM c WHERE rn = 1 ORDER BY event_type""".stripMargin),
    headline = true)

  /** Q201 — association rules over per-user behavior baskets: for every
    * ordered event-type pair (a → b), support, confidence and lift from
    * the distinct (user, type) incidence. The pair join is keyed on
    * user_id (each user contributes at most |event types|² pairs — a
    * constant), never a cross join; the three rates derive from two
    * keyed aggregates and one broadcast of the type counts. */
  val q201 = QueryDef(
    "q201_association_rules",
    (s, d) => {
      val inc = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val users = inc.select("user_id").distinct().count()
      val typeCnt = inc.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val pairs = inc.as("a")
        .join(inc.as("b"), "user_id")
        .filter(col("a.event_type") =!= col("b.event_type"))
        .groupBy(col("a.event_type").as("antecedent"), col("b.event_type").as("consequent"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(typeCnt.withColumnRenamed("event_type", "antecedent")
          .withColumnRenamed("n", "n_a")), "antecedent")
        .join(broadcast(typeCnt.withColumnRenamed("event_type", "consequent")
          .withColumnRenamed("n", "n_b")), "consequent")
        .select(
          col("antecedent"), col("consequent"), col("n_both"),
          r4(col("n_both") / lit(users)).as("support"),
          r4(col("n_both") / col("n_a")).as("confidence"),
          r4((col("n_both") * lit(users)) / (col("n_a") * col("n_b"))).as("lift"))
        .orderBy("antecedent", "consequent")
    },
    Some("""WITH inc AS (SELECT DISTINCT user_id, event_type FROM events),
           |u AS (SELECT COUNT(DISTINCT user_id) AS users FROM inc),
           |tc AS (SELECT event_type, COUNT(*) AS n FROM inc GROUP BY 1),
           |p AS (
           |  SELECT a.event_type AS antecedent, b.event_type AS consequent,
           |         COUNT(*) AS n_both
           |  FROM inc a JOIN inc b USING (user_id)
           |  WHERE a.event_type <> b.event_type
           |  GROUP BY 1, 2)
           |SELECT p.antecedent, p.consequent, p.n_both,
           |       ROUND(p.n_both * 1.0 / u.users, 4) AS support,
           |       ROUND(p.n_both * 1.0 / ta.n, 4) AS confidence,
           |       ROUND(p.n_both * 1.0 * u.users / (ta.n * tb.n), 4) AS lift
           |FROM p, u
           |JOIN tc ta ON ta.event_type = p.antecedent
           |JOIN tc tb ON tb.event_type = p.consequent
           |ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** Q202 — rolling-median smoothing: the 7-day trailing exact median of
    * daily volume per event type — the robust counterpart of the EWMA
    * smoother (q179): one outlier day barely moves it. The `median`
    * aggregate runs AS a window function over a ROWS frame, partitioned
    * per event type on the bounded daily grid (never the raw events).
    * Spark refuses ordered-aggregate functions over a frame, so the
    * 7-value window collects into an array and the median interpolates
    * with collection expressions — constant-bounded per row, codegen. */
  val q202 = QueryDef(
    "q202_rolling_median",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("vals", array_sort(collect_list(col("cnt")).over(w)))
        .withColumn("med7", r4(expr(
          """CASE WHEN size(vals) % 2 = 1
            |     THEN CAST(element_at(vals, CAST(size(vals) / 2 AS INT) + 1) AS DOUBLE)
            |     ELSE (element_at(vals, CAST(size(vals) / 2 AS INT))
            |           + element_at(vals, CAST(size(vals) / 2 AS INT) + 1)) / 2.0 END""".stripMargin)))
        .select(
          col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cnt"), col("med7"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
           |       ROUND(median(cnt) OVER (PARTITION BY event_type ORDER BY day
           |                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
           |FROM daily ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** Q203 — distribution drift monitor: binned two-sample KS statistic
    * and PSI between a reference period (Jan 1–15) and a live period
    * (Jan 16+) of event values, per event type. The KS distance is
    * computed in EXACT integer arithmetic — max |S_ref·n_live −
    * S_live·n_ref| over the bin-grid CDFs (same trick as q200), divided
    * out only at the end — so the max cannot drift on fp summation
    * order; PSI uses half-count Laplace smoothing so empty bins stay
    * finite. Everything after the one grouped scan runs on the bounded
    * (type × bin) grid: partitioned cumulative windows, broadcast
    * per-type totals. */
  val q203 = QueryDef(
    "q203_distribution_drift",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val binned = Tables.events(s, d)
        .select(
          col("event_type"),
          when(to_date(col("ts")) < lit("2024-01-16").cast("date"), lit("ref"))
            .otherwise(lit("live")).as("part"),
          floor(col("value") / lit(10.0)).cast("long").as("bin"))
        .groupBy("event_type", "bin")
        .agg(
          sum(when(col("part") === "ref", 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("part") === "live", 1L).otherwise(0L)).as("c_live"))
      val tot = binned.groupBy("event_type").agg(
        sum(col("c_ref")).as("n_ref"),
        sum(col("c_live")).as("n_live"),
        count(lit(1)).as("n_bins"))
      val w = Window.partitionBy("event_type").orderBy("bin")
      val g = binned
        .withColumn("s_ref", sum(col("c_ref")).over(w))
        .withColumn("s_live", sum(col("c_live")).over(w))
        .join(broadcast(tot), "event_type")
        .withColumn("d", abs(col("s_ref") * col("n_live") - col("s_live") * col("n_ref")))
        .withColumn("p1",
          (col("c_ref") + lit(0.5)) / (col("n_ref") + lit(0.5) * col("n_bins")))
        .withColumn("p2",
          (col("c_live") + lit(0.5)) / (col("n_live") + lit(0.5) * col("n_bins")))
      g.groupBy("event_type")
        .agg(
          first(col("n_ref")).as("n_ref"),
          first(col("n_live")).as("n_live"),
          max(col("d")).as("ks_scaled"),
          r4(max(col("d")) / (first(col("n_ref")) * first(col("n_live")))).as("ks"),
          r4(sum((col("p1") - col("p2")) * log(col("p1") / col("p2")))).as("psi"))
        .orderBy("event_type")
    },
    Some("""WITH binned AS (
           |  SELECT event_type,
           |         CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
           |              THEN 'ref' ELSE 'live' END AS part,
           |         CAST(FLOOR(value / 10.0) AS BIGINT) AS bin
           |  FROM events),
           |g AS (
           |  SELECT event_type, bin,
           |         COUNT(*) FILTER (WHERE part = 'ref') AS c_ref,
           |         COUNT(*) FILTER (WHERE part = 'live') AS c_live
           |  FROM binned GROUP BY 1, 2),
           |t AS (
           |  SELECT event_type, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
           |         CAST(SUM(c_live) AS BIGINT) AS n_live,
           |         COUNT(*) AS n_bins
           |  FROM g GROUP BY 1),
           |c AS (
           |  SELECT g.event_type, g.c_ref, g.c_live, t.n_ref, t.n_live, t.n_bins,
           |         SUM(g.c_ref) OVER (PARTITION BY g.event_type ORDER BY g.bin) AS s_ref,
           |         SUM(g.c_live) OVER (PARTITION BY g.event_type ORDER BY g.bin) AS s_live
           |  FROM g JOIN t USING (event_type))
           |SELECT event_type,
           |       ANY_VALUE(n_ref) AS n_ref, ANY_VALUE(n_live) AS n_live,
           |       CAST(MAX(ABS(s_ref * n_live - s_live * n_ref)) AS BIGINT) AS ks_scaled,
           |       ROUND(MAX(ABS(s_ref * n_live - s_live * n_ref)) * 1.0
           |             / (ANY_VALUE(n_ref) * ANY_VALUE(n_live)), 4) AS ks,
           |       ROUND(SUM(((c_ref + 0.5) / (n_ref + 0.5 * n_bins)
           |                  - (c_live + 0.5) / (n_live + 0.5 * n_bins))
           |                 * ln(((c_ref + 0.5) / (n_ref + 0.5 * n_bins))
           |                      / ((c_live + 0.5) / (n_live + 0.5 * n_bins)))), 4) AS psi
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Q204 — Gini coefficient of customer spend: how concentrated is
    * revenue across customers. Needs every per-customer total globally
    * ranked — the data-sized global sort the engine's
    * [[graft.ops.GlobalRank]] two-pass bucket shape exists for (the
    * oracle uses the naive single-task ROW_NUMBER window; the engine
    * never does). One keyed aggregate, the two-pass rank, one final
    * six-aggregate reduction. */
  val q204 = QueryDef(
    "q204_spend_gini",
    (s, d) => {
      val per = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice")).as("spend"))
      val ranked = graft.ops.GlobalRank.ranked(per, col("spend"), Seq(col("o_custkey")))
      ranked.agg(
        max(col("_total")).as("n_customers"),
        r4(sum(col("spend")) / lit(1e6)).as("total_mm"),
        r4(lit(2.0) * sum(col("_grn") * col("spend"))
            / (max(col("_total")) * sum(col("spend")))
          - (max(col("_total")) + lit(1.0)) / max(col("_total"))).as("gini"))
    },
    Some("""WITH per AS (
           |  SELECT o_custkey, SUM(o_totalprice) AS spend
           |  FROM orders GROUP BY 1),
           |r AS (
           |  SELECT spend,
           |         ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS i,
           |         COUNT(*) OVER () AS n
           |  FROM per)
           |SELECT ANY_VALUE(n) AS n_customers,
           |       ROUND(SUM(spend) / 1000000.0, 4) AS total_mm,
           |       ROUND(2.0 * SUM(i * spend) / (ANY_VALUE(n) * SUM(spend))
           |             - (ANY_VALUE(n) + 1.0) / ANY_VALUE(n), 4) AS gini
           |FROM r""".stripMargin),
    headline = true)

  /** Q205 — Zipf rank-frequency fit over the corpus vocabulary: OLS
    * slope (and R²) of ln(freq) vs ln(rank) for the top-500 words — the
    * standard "is this corpus natural language" screen (natural text fits
    * slope ≈ −1; templated/synthetic text doesn't). Word counts are a
    * vocabulary-keyed shuffle; the rank window runs over the LIMITed
    * 500-row table (bounded by construction), tokenization identical to
    * q64's split-on-space parity rule. */
  val q205 = QueryDef(
    "q205_zipf_fit",
    (s, d) => {
      import graft.core.Windows
      val words = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val top = words.orderBy(col("cnt").desc, col("word")).limit(500)
      top
        .withColumn("rank",
          row_number().over(Windows.bounded(col("cnt").desc, col("word"))))
        .agg(
          count(lit(1)).as("n_words"),
          r4(expr("regr_slope(ln(cnt), ln(rank))")).as("zipf_slope"),
          r4(expr("regr_r2(ln(cnt), ln(rank))")).as("zipf_r2"))
    },
    Some("""WITH w AS (SELECT unnest(str_split(text, ' ')) AS word FROM documents),
           |g AS (SELECT word, COUNT(*) AS cnt FROM w WHERE word <> '' GROUP BY 1),
           |t AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank
           |      FROM g ORDER BY cnt DESC, word LIMIT 500)
           |SELECT COUNT(*) AS n_words,
           |       ROUND(regr_slope(ln(cnt), ln(rank)), 4) AS zipf_slope,
           |       ROUND(regr_r2(ln(cnt), ln(rank)), 4) AS zipf_r2
           |FROM t""".stripMargin),
    headline = true)

  /** Q206 — categorical mix drift: chi-square statistic of the live
    * period's event-type mix against the reference period's proportions
    * (the categorical counterpart of q203's numeric KS). Counts are two
    * FILTER aggregates in one grouped scan; the statistic reduces the
    * 5-row type table. */
  val q206 = QueryDef(
    "q206_chi2_mix_drift",
    (s, d) => {
      val split = lit("2024-01-16").cast("date")
      val g = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy("event_type")
        .agg(
          sum(when(col("day") < split, 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("day") >= split, 1L).otherwise(0L)).as("c_live"))
      val tot = g.agg(
        sum(col("c_ref")).as("n_ref"), sum(col("c_live")).as("n_live"))
      g.crossJoin(broadcast(tot))
        .select(
          col("event_type"), col("c_ref"), col("c_live"),
          (col("c_live") - col("n_live") * col("c_ref") / col("n_ref")).as("dev"),
          (col("n_live") * col("c_ref") / col("n_ref")).as("e"))
        .agg(r4(sum(col("dev") * col("dev") / col("e"))).as("chi2"),
          count(lit(1)).as("n_types"))
    },
    Some("""WITH g AS (
           |  SELECT event_type,
           |         COUNT(*) FILTER (WHERE CAST(ts AS DATE) < DATE '2024-01-16') AS c_ref,
           |         COUNT(*) FILTER (WHERE CAST(ts AS DATE) >= DATE '2024-01-16') AS c_live
           |  FROM events GROUP BY 1),
           |t AS (SELECT SUM(c_ref) AS n_ref, SUM(c_live) AS n_live FROM g)
           |SELECT ROUND(SUM((g.c_live - t.n_live * g.c_ref * 1.0 / t.n_ref)
           |                 * (g.c_live - t.n_live * g.c_ref * 1.0 / t.n_ref)
           |                 / (t.n_live * g.c_ref * 1.0 / t.n_ref)), 4) AS chi2,
           |       COUNT(*) AS n_types
           |FROM g, t""".stripMargin))

  /** Q207 — winsorized mean per event type: exact p05/p95 bounds (one
    * grouped `percentile` aggregate, |types| rows), broadcast back,
    * values clamped, then the plain mean — the robust location estimate
    * that tolerates tail corruption without dropping rows. */
  val q207 = QueryDef(
    "q207_winsorized_mean",
    (s, d) => {
      val ev = Tables.events(s, d).select("event_type", "value")
      val bounds = ev.groupBy("event_type").agg(
        expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
      ev.join(broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
          r4(avg(greatest(col("lo"), least(col("hi"), col("value"))))).as("wmean"),
          r4(avg(col("value"))).as("mean"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some("""WITH b AS (
           |  SELECT event_type,
           |         quantile_cont(value, 0.05) AS lo,
           |         quantile_cont(value, 0.95) AS hi
           |  FROM events GROUP BY 1)
           |SELECT e.event_type,
           |       ROUND(AVG(GREATEST(b.lo, LEAST(b.hi, e.value))), 4) AS wmean,
           |       ROUND(AVG(e.value), 4) AS mean,
           |       COUNT(*) AS n
           |FROM events e JOIN b USING (event_type)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q209 — Pareto 80/20 concentration: how many of the top customers
    * cover 80% of revenue. Customers rank by spend descending through
    * [[graft.ops.GlobalRank.prefixSum]] (distributed two-pass cumulative
    * sum — the oracle keeps the naive global window); the threshold test
    * runs in integer arithmetic (`5·prefix < 4·total` on floored spend)
    * so the boundary cannot drift on fp rounding. Complements q204's
    * Gini with the operational number people actually quote. */
  val q209 = QueryDef(
    "q209_pareto_8020",
    (s, d) => {
      val per = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice")).as("spend"))
        .withColumn("sl", floor(col("spend")).cast("long"))
      val pre = graft.ops.GlobalRank.prefixSum(
        per, col("sl"), -col("spend"), Seq(col("o_custkey")))
      val tot = per.agg(
        sum(col("sl")).as("tot"), count(lit(1)).as("n_customers"))
      pre.crossJoin(broadcast(tot))
        .groupBy("n_customers")
        .agg(
          sum(when(col("_psum") * 5 < col("tot") * 4, 1L).otherwise(0L)).as("top_cnt"),
          r4(sum(when(col("_psum") * 5 < col("tot") * 4, 1L).otherwise(0L))
            / first(col("n_customers"))).as("top_frac"))
        .select("n_customers", "top_cnt", "top_frac")
    },
    Some("""WITH per AS (
           |  SELECT o_custkey, SUM(o_totalprice) AS spend,
           |         CAST(FLOOR(SUM(o_totalprice)) AS BIGINT) AS sl
           |  FROM orders GROUP BY 1),
           |w AS (
           |  SELECT sl,
           |         COALESCE(SUM(sl) OVER (ORDER BY spend DESC, o_custkey
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS psum
           |  FROM per),
           |t AS (SELECT CAST(SUM(sl) AS BIGINT) AS tot, COUNT(*) AS n FROM per)
           |SELECT t.n AS n_customers,
           |       COUNT(*) FILTER (WHERE w.psum * 5 < t.tot * 4) AS top_cnt,
           |       ROUND(COUNT(*) FILTER (WHERE w.psum * 5 < t.tot * 4) * 1.0 / t.n, 4)
           |         AS top_frac
           |FROM w, t GROUP BY t.n""".stripMargin))

  /** Q212 — exact-dedup savings accounting: what dropping exact
    * duplicates (by text hash, q26's key) would save, per source —
    * duplicate docs, duplicate whitespace-tokens, and the duplicate
    * share — the number a pipeline owner reads before scheduling the
    * dedup pass. Two keyed aggregations (hash groups → per-source
    * rollup), token counts via one codegen size/split expression. */
  val q212 = QueryDef(
    "q212_dedup_savings",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(
          col("source"),
          sha2(col("text"), 256).as("h"),
          size(split(col("text"), " ")).cast("long").as("toks"))
      val groups = docs.groupBy("source", "h")
        .agg(count(lit(1)).as("n"), first(col("toks")).as("toks"))
      groups.groupBy("source")
        .agg(
          sum(col("n")).as("docs"),
          sum(col("n") - 1).as("dup_docs"),
          sum((col("n") - 1) * col("toks")).as("dup_tokens"),
          r4(sum(col("n") - 1) / sum(col("n"))).as("dup_share"))
        .orderBy("source")
    },
    Some("""WITH g AS (
           |  SELECT source, sha256(text) AS h, COUNT(*) AS n,
           |         ANY_VALUE(len(str_split(text, ' '))) AS toks
           |  FROM documents GROUP BY 1, 2)
           |SELECT source,
           |       CAST(SUM(n) AS BIGINT) AS docs,
           |       CAST(SUM(n - 1) AS BIGINT) AS dup_docs,
           |       CAST(SUM((n - 1) * toks) AS BIGINT) AS dup_tokens,
           |       ROUND(SUM(n - 1) * 1.0 / SUM(n), 4) AS dup_share
           |FROM g GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q213 — functional-dependency discovery over candidate column pairs
    * (the Deequ/Metanome-style profiling primitive): A → B holds iff
    * |distinct A| = |distinct (A,B)|; the violation count is their
    * difference. All four candidates share ONE aggregation pass over
    * orders (every count_distinct rides the same scan). */
  val q213 = QueryDef(
    "q213_fd_discovery",
    (s, d) => {
      val o = Tables.orders(s, d)
      val pairs = Seq(
        ("o_orderkey", "o_custkey"),   // key → attribute: holds
        ("o_orderkey", "o_orderdate"), // key → attribute: holds
        ("o_custkey", "o_orderstatus"),// many orders per customer: fails
        ("o_orderdate", "o_orderpriority")) // many orders per day: fails
      val aggs = pairs.flatMap { case (a, b) =>
        Seq(
          countDistinct(col(a)).as(s"d_$a$b"),
          countDistinct(col(a), col(b)).as(s"dd_$a$b"))
      }
      val wide = o.agg(aggs.head, aggs.tail: _*)
      val rows = pairs.map { case (a, b) =>
        struct(
          lit(a).as("det"), lit(b).as("dep"),
          col(s"d_$a$b").as("n_det"),
          (col(s"dd_$a$b") - col(s"d_$a$b")).as("violations"),
          (col(s"dd_$a$b") === col(s"d_$a$b")).as("holds"))
      }
      wide.select(explode(array(rows: _*)).as("r"))
        .select("r.det", "r.dep", "r.n_det", "r.violations", "r.holds")
        .orderBy("det", "dep")
    },
    Some("""WITH w AS (
           |  SELECT COUNT(DISTINCT o_orderkey) AS d1,
           |         COUNT(DISTINCT (o_orderkey, o_custkey)) AS dd1,
           |         COUNT(DISTINCT o_orderkey) AS d2,
           |         COUNT(DISTINCT (o_orderkey, o_orderdate)) AS dd2,
           |         COUNT(DISTINCT o_custkey) AS d3,
           |         COUNT(DISTINCT (o_custkey, o_orderstatus)) AS dd3,
           |         COUNT(DISTINCT o_orderdate) AS d4,
           |         COUNT(DISTINCT (o_orderdate, o_orderpriority)) AS dd4
           |  FROM orders)
           |SELECT * FROM (
           |  SELECT 'o_orderkey' AS det, 'o_custkey' AS dep, d1 AS n_det,
           |         dd1 - d1 AS violations, dd1 = d1 AS holds FROM w
           |  UNION ALL
           |  SELECT 'o_orderkey', 'o_orderdate', d2, dd2 - d2, dd2 = d2 FROM w
           |  UNION ALL
           |  SELECT 'o_custkey', 'o_orderstatus', d3, dd3 - d3, dd3 = d3 FROM w
           |  UNION ALL
           |  SELECT 'o_orderdate', 'o_orderpriority', d4, dd4 - d4, dd4 = d4 FROM w)
           |ORDER BY det, dep""".stripMargin))

  /** Q227 — k-anonymity audit ([[graft.ops.KAnonymity]], Sweeney 2002)
    * over the customer release surface: equivalence classes on the
    * quasi-identifier (nation, market segment, account-balance band)
    * with population and the k=5 anonymity verdict — the pre-release
    * re-identification check. ONE keyed aggregation; the class table is
    * bounded by the QI domain, not the row count. */
  val q227 = QueryDef(
    "q227_k_anonymity",
    (s, d) => {
      val qi = Tables.customer(s, d).select(
        col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      graft.ops.KAnonymity.audit(qi, Seq("c_nationkey", "bal_band"), 5)
        .orderBy("c_nationkey", "bal_band")
    },
    Some("""SELECT c_nationkey,
                   CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   COUNT(*) >= 5 AS anonymous
            FROM customer GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Q231 — expectation suggestion ([[graft.ops.Expectations.suggest]],
    * Deequ's constraint-suggestion feature): profile orders' key and
    * measure columns in ONE aggregation job and emit the concrete
    * completeness / range / distinctness bounds a caller would freeze
    * into the q161-style audit gate. The oracle recomputes every
    * suggested value relationally. */
  val q231 = QueryDef(
    "q231_suggest_expectations",
    (s, d) =>
      graft.ops.Expectations.suggest(
        Tables.orders(s, d), Seq("o_orderkey", "o_custkey", "o_totalprice"))
        .orderBy("column_name", "check_name"),
    Some("""WITH a AS (SELECT
              CAST(COUNT(*) AS DOUBLE) AS n,
              CAST(COUNT(o_orderkey) AS DOUBLE) AS c1,
              CAST(MIN(o_orderkey) AS DOUBLE) AS mn1,
              CAST(MAX(o_orderkey) AS DOUBLE) AS mx1,
              CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) AS d1,
              CAST(COUNT(o_custkey) AS DOUBLE) AS c2,
              CAST(MIN(o_custkey) AS DOUBLE) AS mn2,
              CAST(MAX(o_custkey) AS DOUBLE) AS mx2,
              CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS d2,
              CAST(COUNT(o_totalprice) AS DOUBLE) AS c3,
              CAST(MIN(o_totalprice) AS DOUBLE) AS mn3,
              CAST(MAX(o_totalprice) AS DOUBLE) AS mx3,
              CAST(COUNT(DISTINCT o_totalprice) AS DOUBLE) AS d3
            FROM orders)
            SELECT * FROM (
              SELECT 'o_orderkey' AS column_name, 'completeness' AS check_name,
                     ROUND(c1 / n, 6) AS value FROM a
              UNION ALL SELECT 'o_orderkey', 'min', ROUND(mn1, 6) FROM a
              UNION ALL SELECT 'o_orderkey', 'max', ROUND(mx1, 6) FROM a
              UNION ALL SELECT 'o_orderkey', 'distinctness', ROUND(d1 / NULLIF(c1, 0), 6) FROM a
              UNION ALL SELECT 'o_custkey', 'completeness', ROUND(c2 / n, 6) FROM a
              UNION ALL SELECT 'o_custkey', 'min', ROUND(mn2, 6) FROM a
              UNION ALL SELECT 'o_custkey', 'max', ROUND(mx2, 6) FROM a
              UNION ALL SELECT 'o_custkey', 'distinctness', ROUND(d2 / NULLIF(c2, 0), 6) FROM a
              UNION ALL SELECT 'o_totalprice', 'completeness', ROUND(c3 / n, 6) FROM a
              UNION ALL SELECT 'o_totalprice', 'min', ROUND(mn3, 6) FROM a
              UNION ALL SELECT 'o_totalprice', 'max', ROUND(mx3, 6) FROM a
              UNION ALL SELECT 'o_totalprice', 'distinctness', ROUND(d3 / NULLIF(c3, 0), 6) FROM a)
            ORDER BY column_name, check_name"""))

  /** Q238 — distribution drift ACROSS TABLE VERSIONS: q203's smoothed
    * PSI computed between two snapshots of a versioned table (v1 = the
    * raw orders load, v2 = after a repricing merge doubled every third
    * order), per order status. This is the release monitor a warehouse
    * runs after every batch: "did this commit move the money
    * distribution?". Two time-travel scans feed one (status, bin) grid;
    * everything after runs on the bounded grid. The oracle rebuilds both
    * snapshots relationally and replays the same smoothed-PSI formula. */
  val q238 = QueryDef(
    "q238_version_drift",
    (s, d) => {
      import graft.io.VersionedTable
      val path = Scratch.dir("q238") + "/tbl"
      val base = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      VersionedTable.commitAppend(base, path, "o_orderkey")
      VersionedTable.merge(s, path,
        base.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        Seq("o_orderkey"))
      val vs = VersionedTable.versions(s, path)
      def part(v: Long, tag: String) =
        VersionedTable.read(s, path, Some(v))
          .select(
            col("o_orderstatus"),
            lit(tag).as("part"),
            floor(col("o_totalprice") / lit(50000.0)).cast("long").as("bin"))
      val binned = part(vs.head, "ref").unionByName(part(vs.last, "live"))
        .groupBy("o_orderstatus", "bin")
        .agg(
          sum(when(col("part") === "ref", 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("part") === "live", 1L).otherwise(0L)).as("c_live"))
      val tot = binned.groupBy("o_orderstatus").agg(
        sum(col("c_ref")).as("n_ref"),
        sum(col("c_live")).as("n_live"),
        count(lit(1)).as("n_bins"))
      binned.join(broadcast(tot), "o_orderstatus")
        .withColumn("p1",
          (col("c_ref") + lit(0.5)) / (col("n_ref") + lit(0.5) * col("n_bins")))
        .withColumn("p2",
          (col("c_live") + lit(0.5)) / (col("n_live") + lit(0.5) * col("n_bins")))
        .groupBy("o_orderstatus")
        .agg(
          first(col("n_ref")).as("n_ref"),
          r4(sum((col("p1") - col("p2")) * log(col("p1") / col("p2")))).as("psi"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH ref AS (SELECT o_orderstatus,
                                CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin
                         FROM orders),
                 live AS (SELECT o_orderstatus,
                                 CAST(FLOOR(CASE WHEN o_orderkey % 3 = 0
                                                 THEN o_totalprice * 2
                                                 ELSE o_totalprice END / 50000.0) AS BIGINT) AS bin
                          FROM orders),
                 g AS (SELECT o_orderstatus, bin,
                              SUM(CASE WHEN part = 'ref' THEN 1 ELSE 0 END) AS c_ref,
                              SUM(CASE WHEN part = 'live' THEN 1 ELSE 0 END) AS c_live
                       FROM (SELECT o_orderstatus, bin, 'ref' AS part FROM ref
                             UNION ALL
                             SELECT o_orderstatus, bin, 'live' FROM live)
                       GROUP BY 1, 2),
                 t AS (SELECT o_orderstatus, SUM(c_ref) AS n_ref, SUM(c_live) AS n_live,
                              COUNT(*) AS n_bins
                       FROM g GROUP BY 1),
                 p AS (SELECT g.o_orderstatus,
                              t.n_ref,
                              (c_ref + 0.5) / (t.n_ref + 0.5 * t.n_bins) AS p1,
                              (c_live + 0.5) / (t.n_live + 0.5 * t.n_bins) AS p2
                       FROM g JOIN t USING (o_orderstatus))
            SELECT o_orderstatus, CAST(MIN(n_ref) AS BIGINT) AS n_ref,
                   ROUND(SUM((p1 - p2) * LN(p1 / p2)), 4) AS psi
            FROM p GROUP BY 1 ORDER BY 1"""))

  /** Q239 — group-median imputation (the standard numeric repair the
    * reference's '?'→null handling stops short of): null event values
    * fill with their event type's exact median — one tiny
    * percentile-per-group aggregate broadcast back as a coalesce, never
    * a window over data. Interpolation parity with quantile_cont is the
    * q223 contract. */
  val q239 = QueryDef(
    "q239_impute_median",
    (s, d) => {
      val ev = Tables.events(s, d)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      ev.join(broadcast(med), "event_type")
        .withColumn("vf", coalesce(col("value"), col("med")))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_imputed"),
          r4(avg(col("vf"))).as("avg_filled"),
          r4(first(col("med"))).as("median"))
        .orderBy("event_type")
    },
    Some("""WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                       FROM events GROUP BY 1)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
                   ROUND(AVG(COALESCE(value, med)), 4) AS avg_filled,
                   ROUND(MIN(med), 4) AS median
            FROM events JOIN m USING (event_type)
            GROUP BY event_type ORDER BY event_type"""))

  /** Q251 — day-of-week seasonal adjustment (the classical-decomposition
    * step before any alerting on daily volumes): per event type, daily
    * counts are de-seasonalized by subtracting their dow mean, and the
    * variance explained by weekly seasonality (1 − var(residual)/var(raw))
    * is reported — the number that says whether q156's z-scores need a
    * seasonal baseline. Two keyed aggregations over day-level rows
    * (365·types, never event-sized); the internal dow labels differ
    * between engines (Spark 1=Sunday, DuckDB 0=Sunday) but any bijective
    * relabeling yields the same groups, so the means agree exactly. */
  val q251 = QueryDef(
    "q251_seasonal_adjust",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("c"))
        .withColumn("dow", dayofweek(col("day")))
      val dowMean = daily.groupBy("event_type", "dow").agg(avg("c").as("m"))
      daily.join(dowMean, Seq("event_type", "dow"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_days"),
          r4(var_pop(col("c"))).as("var_raw"),
          r4(var_pop(col("c") - col("m"))).as("var_resid"),
          r6(lit(1.0) - var_pop(col("c") - col("m")) / var_pop(col("c")))
            .as("seasonality_strength"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
           |                      CAST(COUNT(*) AS DOUBLE) AS c
           |               FROM events GROUP BY 1, 2),
           |     dd AS (SELECT event_type, day, c, dayofweek(day) AS dow FROM daily),
           |     m AS (SELECT event_type, dow, AVG(c) AS m FROM dd GROUP BY 1, 2)
           |SELECT dd.event_type, COUNT(*) AS n_days,
           |       ROUND(var_pop(c), 4) AS var_raw,
           |       ROUND(var_pop(c - m.m), 4) AS var_resid,
           |       ROUND(1.0 - var_pop(c - m.m) / var_pop(c), 6) AS seasonality_strength
           |FROM dd JOIN m ON dd.event_type = m.event_type AND dd.dow = m.dow
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q263 — shuffle-key skew profile ([[graft.ops.SkewReport]]): for
    * each prospective join/aggregation key, the heaviest key's share,
    * the top-5 share, and max/mean — the diagnosis in front of the
    * salting/planning decisions (q99/q121/q189). One keyed aggregation
    * per column; everything after is key-count-sized. The oracle replays
    * the same counts, the (count, key)-max tie-break, and the top-5 sum
    * (tie order inside an equal-count band cannot change a sum). */
  val q263 = QueryDef(
    "q263_skew_report",
    (s, d) =>
      graft.ops.SkewReport.profile(
        Tables.events(s, d), Seq("event_type", "user_id"), topK = 5)
        .orderBy("key_col"),
    Some("""WITH c1 AS (SELECT CAST(event_type AS VARCHAR) AS k, COUNT(*) AS n
           |            FROM events GROUP BY 1),
           |     t1 AS (SELECT SUM(n) AS n_rows, COUNT(*) AS n_keys,
           |                   MAX(n) AS mx FROM c1),
           |     hk1 AS (SELECT MAX(k) AS heavy_key FROM c1, t1 WHERE n = t1.mx),
           |     tp1 AS (SELECT SUM(n) AS top_n FROM
           |               (SELECT n FROM c1 ORDER BY n DESC, k DESC LIMIT 5)),
           |     c2 AS (SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS n
           |            FROM events GROUP BY 1),
           |     t2 AS (SELECT SUM(n) AS n_rows, COUNT(*) AS n_keys,
           |                   MAX(n) AS mx FROM c2),
           |     hk2 AS (SELECT MAX(k) AS heavy_key FROM c2, t2 WHERE n = t2.mx),
           |     tp2 AS (SELECT SUM(n) AS top_n FROM
           |               (SELECT n FROM c2 ORDER BY n DESC, k DESC LIMIT 5))
           |SELECT 'event_type' AS key_col, CAST(n_rows AS BIGINT) AS n_rows,
           |       CAST(n_keys AS BIGINT) AS n_keys, heavy_key,
           |       ROUND(CAST(mx AS DOUBLE) / n_rows, 6) AS heavy_share,
           |       ROUND(CAST(top_n AS DOUBLE) / n_rows, 6) AS topk_share,
           |       ROUND(CAST(mx AS DOUBLE) * n_keys / n_rows, 4) AS skew_ratio
           |FROM t1, hk1, tp1
           |UNION ALL
           |SELECT 'user_id', CAST(n_rows AS BIGINT), CAST(n_keys AS BIGINT), heavy_key,
           |       ROUND(CAST(mx AS DOUBLE) / n_rows, 6),
           |       ROUND(CAST(top_n AS DOUBLE) / n_rows, 6),
           |       ROUND(CAST(mx AS DOUBLE) * n_keys / n_rows, 4)
           |FROM t2, hk2, tp2
           |ORDER BY key_col""".stripMargin))

  /** Q267 — mutual information between two categorical columns (the
    * dependence MEASURE beside q175's chi-square TEST: MI quantifies how
    * many nats one column tells you about the other, comparable across
    * pairs): I = Σ p_xy · ln(p_xy / (p_x p_y)) over the bounded joint
    * grid. One keyed aggregation builds the grid; marginals come from
    * grid-sized window sums — nothing data-sized after the first
    * aggregate. */
  val q267 = QueryDef(
    "q267_mutual_information",
    (s, d) => {
      val joint = Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("nxy"))
      val total = joint.agg(sum("nxy").as("n"))
      val withMarg = joint
        .withColumn("nx", sum("nxy").over(
          org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")))
        .withColumn("ny", sum("nxy").over(
          org.apache.spark.sql.expressions.Window.partitionBy("l_linestatus")))
        .crossJoin(broadcast(total))
      withMarg
        .agg(
          max(col("n")).as("n_rows"),
          count(lit(1)).as("n_cells"),
          r6(sum((col("nxy") / col("n")) *
            log(col("nxy") * col("n") / (col("nx") * col("ny"))))).as("mi_nats"))
        .select(col("n_rows"), col("n_cells"), col("mi_nats"))
    },
    Some("""WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y, COUNT(*) AS nxy
           |           FROM lineitem GROUP BY 1, 2),
           |     t AS (SELECT SUM(nxy) AS n FROM j),
           |     m AS (SELECT x, y, nxy,
           |                  SUM(nxy) OVER (PARTITION BY x) AS nx,
           |                  SUM(nxy) OVER (PARTITION BY y) AS ny
           |           FROM j)
           |SELECT CAST(MAX(t.n) AS BIGINT) AS n_rows,
           |       COUNT(*) AS n_cells,
           |       ROUND(SUM((CAST(nxy AS DOUBLE) / t.n) *
           |             LN(CAST(nxy AS DOUBLE) * t.n / (CAST(nx AS DOUBLE) * ny))), 6)
           |         AS mi_nats
           |FROM m, t""".stripMargin))

  /** Q269 — two-proportion z-test on an A/B split (the experiment
    * readout q182's Welch t covers for means, here for CONVERSION
    * rates): users split 50/50 by the portable md5 coin, conversion =
    * ever purchased, pooled-variance z statistic and the 95% decision.
    * One user-level aggregate then a 2-row fold — the test statistic
    * comes from four counts, nothing data-sized after the first
    * aggregation. */
  val q269 = QueryDef(
    "q269_ab_proportions",
    (s, d) => {
      // conversion = above-median purchase count, so the rate is interior
      // by construction (every fixture user purchases at least once)
      val counts = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c"))
      val med = counts.agg(expr("percentile(c, 0.5)").as("m"))
      val users = counts.crossJoin(broadcast(med))
        .select(col("user_id"), when(col("c") > col("m"), 1).otherwise(0).as("conv"))
        .withColumn("arm",
          when(conv(
            substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))), 1, 4),
            16, 10).cast("int") % 2 === 0, "A").otherwise("B"))
      val g = users.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("conv").as("x"))
      val wide = g.agg(
        max(when(col("arm") === "A", col("n"))).as("n_a"),
        max(when(col("arm") === "A", col("x"))).as("x_a"),
        max(when(col("arm") === "B", col("n"))).as("n_b"),
        max(when(col("arm") === "B", col("x"))).as("x_b"))
      wide.select(
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        r6(col("x_a") / col("n_a")).as("p_a"),
        r6(col("x_b") / col("n_b")).as("p_b"),
        r4(
          (col("x_a") / col("n_a") - col("x_b") / col("n_b")) /
            sqrt(((col("x_a") + col("x_b")) / (col("n_a") + col("n_b"))) *
              (lit(1.0) - (col("x_a") + col("x_b")) / (col("n_a") + col("n_b"))) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))).as("z"),
        (abs(
          (col("x_a") / col("n_a") - col("x_b") / col("n_b")) /
            sqrt(((col("x_a") + col("x_b")) / (col("n_a") + col("n_b"))) *
              (lit(1.0) - (col("x_a") + col("x_b")) / (col("n_a") + col("n_b"))) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))) > 1.96)
          .as("significant_95"))
    },
    Some("""WITH cnt AS (SELECT user_id,
           |                    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
           |             FROM events GROUP BY 1),
           |     md AS (SELECT quantile_cont(c, 0.5) AS m FROM cnt),
           |     u AS (SELECT user_id,
           |                  CASE WHEN c > md.m THEN 1 ELSE 0 END AS conv
           |           FROM cnt, md),
           |     a AS (SELECT CASE WHEN CAST(('0x' || substr(md5('ab-v1:' ||
           |                    CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2 = 0
           |                  THEN 'A' ELSE 'B' END AS arm, conv
           |           FROM u),
           |     g AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS x FROM a GROUP BY 1),
           |     w AS (SELECT
           |             CAST(MAX(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS n_a,
           |             CAST(MAX(CASE WHEN arm = 'A' THEN x END) AS BIGINT) AS x_a,
           |             CAST(MAX(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS n_b,
           |             CAST(MAX(CASE WHEN arm = 'B' THEN x END) AS BIGINT) AS x_b
           |           FROM g)
           |SELECT n_a, x_a, n_b, x_b,
           |       ROUND(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a,
           |       ROUND(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b,
           |       ROUND((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
           |             SQRT((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
           |                  (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
           |                  (1.0 / n_a + 1.0 / n_b)), 4) AS z,
           |       ABS((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
           |           SQRT((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
           |                (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
           |                (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant_95
           |FROM w""".stripMargin))

  /** Q279 — one-pass k-fold cross-validation of the baseline mean
    * predictor: rows land in 5 folds via the portable md5 coin (the
    * q269 idiom — engine-independent, so the oracle replays the exact
    * split), and every fold's out-of-fold mean and held-out RMSE come
    * from ONE corpus aggregation. The trick is algebraic: per-fold
    * (n, Σy, Σy²) suffice — m_out = (S−s_k)/(N−n_k) and
    * RMSE_k = sqrt((ss_k − 2·m_out·s_k + n_k·m_out²)/n_k) — so k-fold
    * CV costs one scan + a 5-row grid, not k training passes (the
    * leave-fold-out generalization of the LOO trick in q256's target
    * encoding). l_quantity is integer-valued, so the fold sums are
    * EXACT in doubles regardless of aggregation order. */
  val q279 = QueryDef(
    "q279_kfold_cv",
    (s, d) => {
      val rows = Tables.lineitem(s, d).select(
        conv(substring(md5(concat(lit("cv-v1:"),
          col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))), 1, 4), 16, 10)
          .cast("int").%(5).as("fold"),
        col("l_quantity").as("y"))
      val perFold = rows.groupBy("fold").agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("s"),
        sum(col("y") * col("y")).as("ss"))
      val totals = perFold.agg(
        sum(col("n")).as("n_tot"), sum(col("s")).as("s_tot"))
      val mOut = (col("s_tot") - col("s")) / (col("n_tot") - col("n"))
      perFold.crossJoin(broadcast(totals))
        .select(
          col("fold"), col("n"),
          r6(mOut).as("mean_out"),
          r6(sqrt((col("ss") - lit(2.0) * mOut * col("s") + col("n") * mOut * mOut)
            / col("n"))).as("rmse"))
        .orderBy("fold")
    },
    Some("""WITH r AS (SELECT CAST(('0x' || substr(md5('cv-v1:' ||
           |                  CAST(l_orderkey AS VARCHAR) || ':' ||
           |                  CAST(l_linenumber AS VARCHAR)), 1, 4)) AS INTEGER) % 5
           |                    AS fold,
           |                  l_quantity AS y
           |           FROM lineitem),
           |     f AS (SELECT fold, COUNT(*) AS n, SUM(y) AS s, SUM(y * y) AS ss
           |           FROM r GROUP BY 1),
           |     t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot, SUM(s) AS s_tot FROM f)
           |SELECT fold, CAST(n AS BIGINT) AS n,
           |       ROUND((s_tot - s) / (n_tot - n), 6) AS mean_out,
           |       ROUND(SQRT((ss - 2 * ((s_tot - s) / (n_tot - n)) * s
           |                   + n * ((s_tot - s) / (n_tot - n))
           |                       * ((s_tot - s) / (n_tot - n))) / n), 6) AS rmse
           |FROM f CROSS JOIN t ORDER BY fold""".stripMargin))

  /** Q297 — CUPED variance reduction (Deng et al. WSDM 2013): the
    * standard A/B-test trick — regress the experiment-period metric on
    * its PRE-period value and analyze the residualized metric, cutting
    * variance by the squared pre/post correlation at zero bias (θ is
    * pooled, so E[Y_cuped] per arm = E[Y] shifted by a constant).
    * Everything — θ, adjusted means, per-arm variances, the reduction
    * share — derives from ONE (n, Σx, Σy, Σxy, Σx², Σy²) aggregation
    * per arm plus its pooled rollup: the q279 closed-from-sums pattern,
    * no second scan, no per-row adjustment materialized. Arms come from
    * the md5 coin (engine-replayable); the oracle replays the full
    * moment algebra, so a wrong θ pool or a mixed-up arm hash-fails. */
  val q297 = QueryDef(
    "q297_cuped_ab",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), unix_micros(col("ts")).as("us"),
        coalesce(col("value"), lit(0.0)).as("v"))
      val mid = ev.agg(expr("(min(us) + max(us)) DIV 2").as("mid_us"))
      val users = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(
          sum(when(col("us") < col("mid_us"), col("v")).otherwise(lit(0.0))).as("x"),
          sum(when(col("us") >= col("mid_us"), col("v")).otherwise(lit(0.0))).as("y"))
        .withColumn("arm",
          conv(substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
            1, 4), 16, 10).cast("int") % 2)
      val pooled = users.agg(
        count(lit(1)).as("n_g"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      val arms = users.groupBy("arm").agg(
        count(lit(1)).as("n"), sum("x").as("ax"), sum("y").as("ay"),
        sum(col("x") * col("y")).as("axy"), sum(col("x") * col("x")).as("axx"),
        sum(col("y") * col("y")).as("ayy"))
      val theta = (col("sxy") - col("sx") * col("sy") / col("n_g")) /
        (col("sxx") - col("sx") * col("sx") / col("n_g"))
      val mx = col("ax") / col("n"); val my = col("ay") / col("n")
      val covA = col("axy") / col("n") - mx * my
      val vx = col("axx") / col("n") - mx * mx
      val vy = col("ayy") / col("n") - my * my
      arms.crossJoin(broadcast(pooled))
        .select(
          col("arm"), col("n"),
          r6(my).as("mean_y"),
          r6(my - theta * (mx - col("sx") / col("n_g"))).as("mean_cuped"),
          r4(vy).as("var_y"),
          r4(vy - lit(2.0) * theta * covA + theta * theta * vx).as("var_cuped"),
          r4((lit(2.0) * theta * covA - theta * theta * vx) / vy).as("var_reduction"))
        .orderBy("arm")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, COALESCE(value, 0) AS v
           |           FROM events),
           |     m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM e),
           |     u AS (SELECT user_id,
           |                  SUM(CASE WHEN us < mid_us THEN v ELSE 0 END) AS x,
           |                  SUM(CASE WHEN us >= mid_us THEN v ELSE 0 END) AS y
           |           FROM e CROSS JOIN m GROUP BY 1),
           |     ua AS (SELECT CAST(('0x' || substr(md5('ab-v1:' ||
           |                    CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2 AS arm,
           |                  x, y FROM u),
           |     g AS (SELECT COUNT(*) AS n_g, SUM(x) AS sx, SUM(y) AS sy,
           |                  SUM(x*y) AS sxy, SUM(x*x) AS sxx FROM ua),
           |     t AS (SELECT n_g, sx,
           |                  (sxy - sx*sy/n_g) / (sxx - sx*sx/n_g) AS theta FROM g),
           |     a AS (SELECT arm, COUNT(*) AS n, SUM(x) AS ax, SUM(y) AS ay,
           |                  SUM(x*y) AS axy, SUM(x*x) AS axx, SUM(y*y) AS ayy
           |           FROM ua GROUP BY 1),
           |     c AS (SELECT arm, n, ax/n AS mx, ay/n AS my,
           |                  axy/n - (ax/n)*(ay/n) AS cov_a,
           |                  axx/n - (ax/n)*(ax/n) AS vx,
           |                  ayy/n - (ay/n)*(ay/n) AS vy
           |           FROM a)
           |SELECT arm, CAST(n AS BIGINT) AS n,
           |       ROUND(my, 6) AS mean_y,
           |       ROUND(my - theta * (mx - sx/n_g), 6) AS mean_cuped,
           |       ROUND(vy, 4) AS var_y,
           |       ROUND(vy - 2*theta*cov_a + theta*theta*vx, 4) + 0 AS var_cuped,
           |       ROUND((2*theta*cov_a - theta*theta*vx) / vy, 4) + 0 AS var_reduction
           |FROM c CROSS JOIN t ORDER BY arm""".stripMargin))

  /** Q298 — grouped closed-form OLS: per-brand regression of quantity on
    * discount (the promo-elasticity read), slope/intercept/R² derived
    * from the same ONE (n, Σx, Σy, Σxy, Σx², Σy²) pass as q297/q279 —
    * per-group regression WITHOUT per-group model fitting, the shape
    * that turns "train 25 models" into one keyed aggregation over a
    * broadcast-joined fact. Degenerate groups (zero x- or y-variance)
    * emit null slope/R² via the same CASE both engines evaluate. */
  val q298 = QueryDef(
    "q298_grouped_ols",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_discount").as("x"), col("l_quantity").as("y"))
      val sums = li
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val cxy = col("sxy") - col("sx") * col("sy") / col("n")
      val cxx = col("sxx") - col("sx") * col("sx") / col("n")
      val cyy = col("syy") - col("sy") * col("sy") / col("n")
      val slope = when(cxx > 0, cxy / cxx)
      sums.select(
        col("brand"), col("n"),
        r6(slope).as("slope"),
        r6(col("sy") / col("n") - slope * col("sx") / col("n")).as("intercept"),
        r6(when(cxx > 0 && cyy > 0, cxy * cxy / (cxx * cyy))).as("r2"))
        .orderBy("brand")
    },
    Some("""WITH j AS (SELECT p_brand AS brand, l_discount AS x, l_quantity AS y
           |           FROM lineitem JOIN part ON l_partkey = p_partkey),
           |     s AS (SELECT brand, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           |                  SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
           |           FROM j GROUP BY 1),
           |     c AS (SELECT brand, n,
           |                  sxy - sx*sy/n AS cxy,
           |                  sxx - sx*sx/n AS cxx,
           |                  syy - sy*sy/n AS cyy,
           |                  sx/n AS mx, sy/n AS my
           |           FROM s)
           |SELECT brand, CAST(n AS BIGINT) AS n,
           |       ROUND(CASE WHEN cxx > 0 THEN cxy / cxx END, 6) AS slope,
           |       ROUND(my - (CASE WHEN cxx > 0 THEN cxy / cxx END) * mx, 6)
           |         AS intercept,
           |       ROUND(CASE WHEN cxx > 0 AND cyy > 0
           |                  THEN cxy * cxy / (cxx * cyy) END, 6) AS r2
           |FROM c ORDER BY brand""".stripMargin))

  /** Q299 — hash-subsample stability (m-out-of-n, Politis-Romano): B
    * half-sample replicates of the mean order value, every replicate's
    * membership decided by the md5 coin over (replicate, order key) —
    * the deterministic, engine-replayable stand-in for bootstrap SEs.
    * Scale shape: the explode is CPU-only fan-out; the per-replicate
    * aggregation partial-aggregates map-side, so the shuffle carries
    * B×partitions part-rows, never B×data — subsample CI at the cost of
    * one scan's worth of hashing. */
  val q299 = QueryDef(
    "q299_subsample_ci",
    (s, d) => {
      val B = 20
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          explode(sequence(lit(0), lit(B - 1))).as("rep"))
        .filter(conv(substring(md5(concat(lit("ci-v1:"), col("rep").cast("string"),
          lit(":"), col("o_orderkey").cast("string"))), 1, 4), 16, 10)
          .cast("int") % 2 === 0)
        .groupBy("rep")
        .agg(count(lit(1)).as("n"), r4(avg(col("o_totalprice"))).as("mean_total"))
        .orderBy("rep")
    },
    Some("""WITH r AS (SELECT o_orderkey, o_totalprice, b.rep
           |           FROM orders CROSS JOIN
           |                (SELECT UNNEST(range(20)) AS rep) b
           |           WHERE CAST(('0x' || substr(md5('ci-v1:' ||
           |                  CAST(b.rep AS VARCHAR) || ':' ||
           |                  CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INTEGER) % 2 = 0)
           |SELECT CAST(rep AS INTEGER) AS rep, COUNT(*) AS n,
           |       ROUND(AVG(o_totalprice), 4) AS mean_total
           |FROM r GROUP BY rep ORDER BY rep""".stripMargin))

  /** Q300 — l-diversity audit ([[graft.ops.KAnonymity.lDiversity]]):
    * q227's homogeneity-attack complement — a (segment, balance-band)
    * class can be comfortably k-anonymous and still disclose every
    * member's nation if all of them share one. One keyed aggregation;
    * the class table is QI-domain-bounded. */
  val q300 = QueryDef(
    "q300_l_diversity",
    (s, d) => {
      val rel = Tables.customer(s, d).select(
        col("c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long").as("bal_band"),
        col("c_nationkey"))
      graft.ops.KAnonymity.lDiversity(
        rel, Seq("c_mktsegment", "bal_band"), "c_nationkey", 3)
        .orderBy("c_mktsegment", "bal_band")
    },
    Some("""SELECT c_mktsegment,
           |       CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
           |       CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_sensitive,
           |       COUNT(DISTINCT c_nationkey) >= 3 AS diverse
           |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Q301 — Laplace-mechanism release of the event-type counts, with a
    * HASH-SEEDED noise stream so the release is reproducible and
    * engine-replayable (the mechanism — sensitivity-1 counts, scale
    * b = 1/ε, inverse-CDF sampling — is the production shape; a real
    * deployment swaps the md5 uniform for a secret-seeded RNG, since a
    * public seed leaks the noise). u comes from 8 md5 hex digits
    * (+0.5 keeps it off the ln(0) pole exactly), noise =
    * −b·sign(u−½)·ln(1−2|u−½|). Per-type, one aggregation. */
  val q301 = QueryDef(
    "q301_dp_counts",
    (s, d) => {
      val b = 2.0 // eps = 0.5, sensitivity 1
      val counts = Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val u = (conv(substring(md5(concat(lit("dp-v1:"), col("event_type"))), 1, 8), 16, 10)
        .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
      val noise = lit(-b) * signum(u - lit(0.5)) *
        log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
      counts.select(
        col("event_type"), col("n"),
        r6(col("n") + noise).as("noisy_n"),
        r6(abs(noise)).as("abs_err"))
        .orderBy("event_type")
    },
    Some("""WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
           |     s AS (SELECT event_type, n,
           |                  (CAST(('0x' || substr(md5('dp-v1:' || event_type), 1, 8))
           |                        AS BIGINT) + 0.5) / 4294967296.0 AS u
           |           FROM c)
           |SELECT event_type, n,
           |       ROUND(n + (-2.0) * SIGN(u - 0.5) * LN(1.0 - 2.0 * ABS(u - 0.5)), 6)
           |         AS noisy_n,
           |       ROUND(ABS((-2.0) * SIGN(u - 0.5) * LN(1.0 - 2.0 * ABS(u - 0.5))), 6)
           |         AS abs_err
           |FROM s ORDER BY event_type""".stripMargin))

  /** Q302 — split-conformal prediction interval (Papadopoulos 2002 /
    * Lei 2018): the distribution-free interval every production
    * regression ships with — fit on TRAIN, take the α-quantile of
    * absolute residuals on CALIBRATION, report coverage on TEST. Fully
    * distributed: the md5 coin 4-ways the rows, the OLS fit is the
    * q298 closed-from-sums scalar (broadcast back), calibration rides
    * Spark's exact `percentile` aggregate, coverage is one more fold.
    * Coefficients round to 6 decimals BEFORE scoring on BOTH engines so
    * every residual is bit-identical cross-engine and the
    * threshold comparison can never flip on last-ulp fit noise. */
  val q302 = QueryDef(
    "q302_conformal_interval",
    (s, d) => {
      val rows = Tables.lineitem(s, d).select(
        col("l_quantity").as("x"), col("l_extendedprice").as("y"),
        (conv(substring(md5(concat(lit("cp-v1:"),
          col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))), 1, 4), 16, 10)
          .cast("int") % 4).as("split"))
      val fit = rows.filter(col("split") <= 1).agg(
        count(lit(1)).as("n_train"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      val slope = r6((col("sxy") - col("sx") * col("sy") / col("n_train")) /
        (col("sxx") - col("sx") * col("sx") / col("n_train")))
      val coefs = fit.select(
        col("n_train"), slope.as("b"),
        r6(col("sy") / col("n_train") - slope * col("sx") / col("n_train")).as("a"))
      val scored = rows.filter(col("split") >= 2).crossJoin(broadcast(coefs))
        .select(col("split"), col("n_train"),
          abs(col("y") - col("a") - col("b") * col("x")).as("r"))
      val qhat = scored.filter(col("split") === 2)
        .agg(count(lit(1)).as("n_cal"), expr("percentile(r, 0.9)").as("q90"))
      scored.filter(col("split") === 3).crossJoin(broadcast(qhat))
        .groupBy("n_train", "n_cal")
        .agg(
          count(lit(1)).as("n_test"),
          r4(first(col("q90"))).as("q_alpha"),
          r4(avg((col("r") <= col("q90")).cast("double"))).as("coverage"))
        .select("n_train", "n_cal", "n_test", "q_alpha", "coverage")
    },
    Some("""WITH r0 AS (SELECT l_quantity AS x, l_extendedprice AS y,
           |                   CAST(('0x' || substr(md5('cp-v1:' ||
           |                     CAST(l_orderkey AS VARCHAR) || ':' ||
           |                     CAST(l_linenumber AS VARCHAR)), 1, 4)) AS INTEGER) % 4
           |                     AS split
           |            FROM lineitem),
           |     f AS (SELECT COUNT(*) AS n_train, SUM(x) AS sx, SUM(y) AS sy,
           |                  SUM(x*y) AS sxy, SUM(x*x) AS sxx
           |           FROM r0 WHERE split <= 1),
           |     c AS (SELECT n_train,
           |                  ROUND((sxy - sx*sy/n_train) / (sxx - sx*sx/n_train), 6) AS b,
           |                  ROUND(sy/n_train -
           |                        ROUND((sxy - sx*sy/n_train) / (sxx - sx*sx/n_train), 6)
           |                          * sx/n_train, 6) AS a
           |           FROM f),
           |     sc AS (SELECT split, ABS(y - a - b * x) AS r
           |            FROM r0 CROSS JOIN c WHERE split >= 2),
           |     q AS (SELECT COUNT(*) AS n_cal, quantile_cont(r, 0.9) AS q90
           |           FROM sc WHERE split = 2)
           |SELECT CAST(c.n_train AS BIGINT) AS n_train,
           |       CAST(q.n_cal AS BIGINT) AS n_cal,
           |       CAST(COUNT(*) AS BIGINT) AS n_test,
           |       ROUND(MIN(q.q90), 4) AS q_alpha,
           |       ROUND(AVG(CASE WHEN sc.r <= q.q90 THEN 1.0 ELSE 0.0 END), 4)
           |         AS coverage
           |FROM sc CROSS JOIN q CROSS JOIN c WHERE sc.split = 3
           |GROUP BY 1, 2""".stripMargin))

  /** Q306 — Theil T inequality index over positive account balances:
    * the decomposable companion to q204's Gini (Theil splits exactly
    * into within/between-group terms, which Gini cannot). Identity
    * T = (Σ x·ln x)/Σx − ln(Σx/n) puts the whole index in TWO sums —
    * one aggregation, no sort (Gini needs the rank pass), so at 100 TB
    * this is the cheap inequality probe. Oracle replays the identity. */
  val q306 = QueryDef(
    "q306_theil_inequality",
    (s, d) => {
      val x = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0)
        .select(col("c_acctbal").as("x"))
      x.agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"),
          sum(col("x") * log(col("x"))).as("sxlx"))
        .select(
          col("n"),
          r4(col("sx") / col("n")).as("mean_bal"),
          r6(col("sxlx") / col("sx") - log(col("sx") / col("n"))).as("theil_t"))
    },
    Some("""WITH a AS (SELECT COUNT(*) AS n, SUM(c_acctbal) AS sx,
           |                  SUM(c_acctbal * LN(c_acctbal)) AS sxlx
           |           FROM customer WHERE c_acctbal > 0)
           |SELECT n, ROUND(sx / n, 4) AS mean_bal,
           |       ROUND(sxlx / sx - LN(sx / n), 6) AS theil_t
           |FROM a""".stripMargin))

  /** Q320 — Theil between/within decomposition (completes q306, VERDICT
    * r12 item 5): the whole reason to pick Theil over Gini at scale is
    * the exact additive split T = T_between + T_within over groups —
    * "how much balance inequality lives ACROSS nations vs INSIDE them".
    * T_between = Σ_g (s_g/S)·ln(μ_g/μ), T_within = Σ_g (s_g/S)·T_g, all
    * closed-from-sums: ONE per-nation moment aggregation (n_g, Σx,
    * Σx·ln x over a broadcast nation join), one 25-row rollup to the
    * global sums, one 25-row reduce to the components — shuffle is one
    * keyed agg regardless of corpus size. The emitted `identity_gap` =
    * ROUND(T − T_b − T_w, 6) + 0 pins the algebraic identity at exactly
    * 0.0 in BOTH engines (the subtraction is ~1e-16 float noise; the
    * `+ 0` guard kills IEEE −0.0, the q268 render class). */
  val q320 = QueryDef(
    "q320_theil_decomposition",
    (s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0)
        .join(
          broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_acctbal").as("x"))
      val g = c.groupBy("n_name").agg(
        count(lit(1)).as("ng"),
        sum("x").as("sg"),
        sum(col("x") * log(col("x"))).as("sxlxg"))
      val tot = g.agg(
        sum("ng").as("n"), sum("sg").as("sx"), sum("sxlxg").as("sxlx"),
        count(lit(1)).as("n_groups"))
      g.crossJoin(broadcast(tot))
        .groupBy("n_groups", "n")
        .agg(
          sum((col("sg") / col("sx")) *
            log((col("sg") / col("ng")) / (col("sx") / col("n")))).as("bw"),
          sum((col("sg") / col("sx")) *
            (col("sxlxg") / col("sg") - log(col("sg") / col("ng")))).as("wi"),
          max(col("sxlx") / col("sx") - log(col("sx") / col("n"))).as("tt"))
        .select(
          col("n_groups"), col("n"),
          r6(col("bw")).as("theil_between"),
          r6(col("wi")).as("theil_within"),
          (round(col("tt") - col("bw") - col("wi"), 6) + lit(0.0)).as("identity_gap"))
    },
    Some("""WITH g AS (SELECT n_name, COUNT(*) AS ng, SUM(c_acctbal) AS sg,
           |                  SUM(c_acctbal * LN(c_acctbal)) AS sxlxg
           |           FROM customer JOIN nation ON c_nationkey = n_nationkey
           |           WHERE c_acctbal > 0 GROUP BY n_name),
           |     t AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, SUM(sg) AS sx,
           |                  SUM(sxlxg) AS sxlx, COUNT(*) AS n_groups FROM g),
           |     p AS (SELECT t.n_groups, t.n,
           |                  SUM((g.sg / t.sx) * LN((g.sg / g.ng) / (t.sx / t.n))) AS bw,
           |                  SUM((g.sg / t.sx) * (g.sxlxg / g.sg - LN(g.sg / g.ng))) AS wi,
           |                  MAX(t.sxlx / t.sx - LN(t.sx / t.n)) AS tt
           |           FROM g CROSS JOIN t GROUP BY 1, 2)
           |SELECT n_groups, n, ROUND(bw, 6) AS theil_between,
           |       ROUND(wi, 6) AS theil_within,
           |       ROUND(tt - bw - wi, 6) + 0 AS identity_gap
           |FROM p""".stripMargin))

  /** Q324 — Mann-Whitney U (Wilcoxon rank-sum) on per-user activity by
    * arm: the NONPARAMETRIC two-sample test the t-shaped comparisons
    * (q297/q307) cannot replace when the metric is heavy-tailed count
    * data. Midranks come from the VALUE GRID, not from ranking rows: a
    * per-user activity count has a domain-bounded set of distinct values
    * (like q296's duration grid), so the cumulative window runs over
    * that bounded grid under the `Windows.bounded` discipline while the
    * data-sized work stays in two keyed aggregations. Exact integers
    * throughout: 2·midrank = 2·cumLess + n_v + 1, so the doubled rank
    * sum and U are BIGINT-exact; only the final z is FP. Tie-corrected
    * variance: σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1))). */
  val q324 = QueryDef(
    "q324_mann_whitney",
    (s, d) => {
      import graft.core.Windows
      val perUser = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("v"))
        .select(
          col("v"),
          (conv(substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
            1, 4), 16, 10).cast("int") % 2).as("arm"))
      val grid = perUser.groupBy("v").agg(
        count(lit(1)).as("n_v"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_av"))
      val before = Windows.bounded(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val ranked = grid
        .withColumn("cum_less", coalesce(sum(col("n_v")).over(before), lit(0L)))
        .withColumn("mid2", lit(2L) * col("cum_less") + col("n_v") + lit(1L))
      val sums = ranked.agg(
        sum("n_v").as("n"), sum("n_av").as("n_a"),
        sum(col("n_av") * col("mid2")).as("r2a"),
        sum(col("n_v") * col("n_v") * col("n_v") - col("n_v")).as("ties"))
      val nb = col("n") - col("n_a")
      val u2 = col("r2a") - col("n_a") * (col("n_a") + 1)
      val sigma2 = (col("n_a") * nb).cast("double") / 12.0 *
        ((col("n") + 1).cast("double") -
          col("ties").cast("double") / (col("n") * (col("n") - 1)).cast("double"))
      sums.select(
        col("n_a"), nb.as("n_b"),
        (u2.cast("double") / 2.0).as("u_a"),
        r6((u2.cast("double") / 2.0 - (col("n_a") * nb).cast("double") / 2.0) /
          sqrt(sigma2)).as("z"))
    },
    Some("""WITH pu AS (SELECT CAST(('0x' || substr(md5('ab-v1:' ||
           |                     CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2 AS arm,
           |                   COUNT(*) AS v
           |            FROM events GROUP BY user_id),
           |     g AS (SELECT v, COUNT(*) AS n_v,
           |                  SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_av
           |           FROM pu GROUP BY v),
           |     rk AS (SELECT v, n_v, n_av,
           |                   COALESCE(SUM(n_v) OVER (ORDER BY v
           |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |                     AS cum_less
           |            FROM g),
           |     f AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n,
           |                  CAST(SUM(n_av) AS BIGINT) AS n_a,
           |                  CAST(SUM(n_av * (2 * cum_less + n_v + 1)) AS BIGINT) AS r2a,
           |                  CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS ties
           |           FROM rk)
           |SELECT n_a, n - n_a AS n_b,
           |       CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
           |       ROUND((CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0
           |              - CAST(n_a * (n - n_a) AS DOUBLE) / 2.0)
           |             / SQRT(CAST(n_a * (n - n_a) AS DOUBLE) / 12.0
           |                    * ((n + 1) - CAST(ties AS DOUBLE) / (n * (n - 1)))), 6)
           |         AS z
           |FROM f""".stripMargin))

  /** Two-sided normal p-value from a z-score via Abramowitz-Stegun
    * 7.1.26 (|error| < 7.5e-8) — Spark SQL has no Φ, so the SAME fixed
    * polynomial is spelled out here and in the oracle SQL: deterministic
    * in both engines, accuracy pinned by the p(1.96) ≈ 0.05 spec. */
  private[graft] def pNormTwoSided(z: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val a = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * a)
    lit(2.0) * (exp(-a * a / 2.0) / math.sqrt(2.0 * math.Pi) *
      (lit(0.319381530) * t - lit(0.356563782) * pow(t, 2) +
        lit(1.781477937) * pow(t, 3) - lit(1.821255978) * pow(t, 4) +
        lit(1.330274429) * pow(t, 5)))
  }

  /** Q326 — Benjamini-Hochberg FDR control over the q294-style per-brand
    * return-rate z-scores: with 25 simultaneous brand tests, "p < 0.05"
    * yields ~1.25 false alarms PER SWEEP; BH bounds the expected FALSE
    * DISCOVERY share instead — the correction every metrics sweep at
    * scale needs. p-values via the fixed A&S polynomial (same arithmetic
    * both engines); the rank/threshold windows run over the brand grid
    * (domain-bounded, `Windows.bounded`); the data-sized work is one
    * broadcast-join aggregation. Emits (brand, z, p, k, discovery) with
    * discovery = k ≤ k* = max{k : p_(k) ≤ α·k/m}, α = 0.05. */
  val q326 = QueryDef(
    "q326_bh_fdr",
    (s, d) => {
      import graft.core.Windows
      val W = org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d).select(
        col("l_partkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
      val b = li.join(
          broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"), sum("ret").as("r"))
      val g = b.agg(sum("n").as("n_all"), sum("r").as("r_all"))
      val rate = col("r_all").cast("double") / col("n_all")
      val zv = (col("r").cast("double") / col("n") - rate) /
        sqrt(rate * (lit(1.0) - rate) / col("n"))
      val p = b.crossJoin(broadcast(g))
        .select(col("brand"), zv.as("zv"))
        .withColumn("pv", pNormTwoSided(col("zv")))
      val w = Windows.bounded(col("pv"), col("brand"))
      val full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
      p.withColumn("k", row_number().over(w))
        .withColumn("m", count(lit(1)).over(full))
        .withColumn("kstar", coalesce(
          max(when(col("pv") <= lit(0.05) * col("k") / col("m"), col("k"))).over(full),
          lit(0L)))
        .select(
          col("brand"), (r4(col("zv")) + lit(0.0)).as("z"), r6(col("pv")).as("p"),
          col("k").cast("long").as("k"), (col("k") <= col("kstar")).as("discovery"))
        .orderBy("brand")
    },
    Some("""WITH li AS (SELECT l_partkey,
           |                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
           |            FROM lineitem),
           |     b AS (SELECT p_brand AS brand, COUNT(*) AS n, SUM(ret) AS r
           |           FROM li JOIN part ON l_partkey = p_partkey GROUP BY 1),
           |     g AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all,
           |                  CAST(SUM(r) AS BIGINT) AS r_all FROM b),
           |     z AS (SELECT brand,
           |                  (CAST(r AS DOUBLE) / n - CAST(r_all AS DOUBLE) / n_all)
           |                  / SQRT((CAST(r_all AS DOUBLE) / n_all)
           |                         * (1.0 - CAST(r_all AS DOUBLE) / n_all) / n) AS zv
           |           FROM b CROSS JOIN g),
           |     p AS (SELECT brand, zv,
           |                  2.0 * (EXP(-ABS(zv)*ABS(zv)/2.0) / SQRT(2.0*PI())
           |                    * (0.319381530 * (1.0/(1.0+0.2316419*ABS(zv)))
           |                       - 0.356563782 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 2)
           |                       + 1.781477937 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 3)
           |                       - 1.821255978 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 4)
           |                       + 1.330274429 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 5)))
           |                    AS pv
           |           FROM z),
           |     rk AS (SELECT brand, zv, pv,
           |                   ROW_NUMBER() OVER (ORDER BY pv, brand) AS k,
           |                   COUNT(*) OVER () AS m
           |            FROM p),
           |     ks AS (SELECT COALESCE(MAX(CASE WHEN pv <= 0.05 * k / m
           |                                     THEN k END), 0) AS kstar
           |            FROM rk)
           |SELECT brand, ROUND(zv, 4) + 0 AS z, ROUND(pv, 6) AS p,
           |       CAST(k AS BIGINT) AS k, k <= kstar AS discovery
           |FROM rk CROSS JOIN ks ORDER BY brand""".stripMargin))

  /** Q327 — Spearman rank correlation between per-user activity and
    * per-user purchases, via midranks on the VALUE GRIDS (the q324
    * discipline): both metrics have domain-bounded distinct values, so
    * the rank windows run over bounded grids while the data-sized work
    * is one keyed aggregation + two grid joins. Doubled midranks keep
    * every rank sum BIGINT-exact; ρ = Pearson over the doubled midranks
    * (scaling both by 2 leaves the correlation unchanged). The rank
    * correlation survives the monotone transforms and heavy tails that
    * break raw Pearson on count data. */
  val q327 = QueryDef(
    "q327_spearman",
    (s, d) => {
      import graft.core.Windows
      val W = org.apache.spark.sql.expressions.Window
      val pu = Tables.events(s, d).groupBy("user_id").agg(
        count(lit(1)).as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
      def mid2(df: org.apache.spark.sql.DataFrame, v: String, out: String) = {
        val grid = df.groupBy(v).agg(count(lit(1)).as("n_v"))
        val before = Windows.bounded(col(v)).rowsBetween(W.unboundedPreceding, -1)
        grid.withColumn(out,
          lit(2L) * coalesce(sum(col("n_v")).over(before), lit(0L)) +
            col("n_v") + lit(1L))
          .select(col(v), col(out))
      }
      val j = pu
        .join(mid2(pu, "a", "ra2"), "a")
        .join(mid2(pu, "b", "rb2"), "b")
      val m = j.agg(
        count(lit(1)).as("n"),
        sum("ra2").as("sa"), sum("rb2").as("sb"),
        sum(col("ra2").cast("double") * col("rb2")).as("sab"),
        sum(col("ra2").cast("double") * col("ra2")).as("saa"),
        sum(col("rb2").cast("double") * col("rb2")).as("sbb"))
      m.select(
        col("n"),
        r6((col("sab") - col("sa").cast("double") * col("sb") / col("n")) /
          sqrt((col("saa") - col("sa").cast("double") * col("sa") / col("n")) *
            (col("sbb") - col("sb").cast("double") * col("sb") / col("n"))))
          .as("spearman_rho"))
    },
    Some("""WITH pu AS (SELECT user_id, COUNT(*) AS a,
           |                   SUM(CASE WHEN event_type = 'purchase'
           |                            THEN 1 ELSE 0 END) AS b
           |            FROM events GROUP BY 1),
           |     ga AS (SELECT a, COUNT(*) AS na FROM pu GROUP BY 1),
           |     ra AS (SELECT a, 2 * COALESCE(SUM(na) OVER (ORDER BY a
           |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |                     + na + 1 AS ra2 FROM ga),
           |     gb AS (SELECT b, COUNT(*) AS nb FROM pu GROUP BY 1),
           |     rb AS (SELECT b, 2 * COALESCE(SUM(nb) OVER (ORDER BY b
           |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |                     + nb + 1 AS rb2 FROM gb),
           |     j AS (SELECT pu.user_id, ra.ra2, rb.rb2
           |           FROM pu JOIN ra USING (a) JOIN rb USING (b)),
           |     m AS (SELECT COUNT(*) AS n, SUM(ra2) AS sa, SUM(rb2) AS sb,
           |                  SUM(CAST(ra2 AS DOUBLE) * rb2) AS sab,
           |                  SUM(CAST(ra2 AS DOUBLE) * ra2) AS saa,
           |                  SUM(CAST(rb2 AS DOUBLE) * rb2) AS sbb
           |           FROM j)
           |SELECT CAST(n AS BIGINT) AS n,
           |       ROUND((sab - CAST(sa AS DOUBLE) * sb / n)
           |             / SQRT((saa - CAST(sa AS DOUBLE) * sa / n)
           |                    * (sbb - CAST(sb AS DOUBLE) * sb / n)), 6)
           |         AS spearman_rho
           |FROM m""".stripMargin))

  /** Q328 — delta-method CI for a RATIO metric (value per event across
    * users): ratio metrics violate the i.i.d.-rows assumption (the unit
    * of randomization is the USER, numerator and denominator are
    * correlated within user), so the naive per-row SE is wrong; the
    * delta method gives Var(x̄/ȳ) ≈ (s_xx − 2R·s_xy + R²·s_yy)/(n·ȳ²)
    * from ONE per-user moment aggregation — the standard CTR/ARPU
    * interval at any scale. */
  val q328 = QueryDef(
    "q328_ratio_ci",
    (s, d) => {
      val pu = Tables.events(s, d).groupBy("user_id").agg(
        sum(coalesce(col("value"), lit(0.0))).as("x"),
        count(lit(1)).cast("double").as("y"))
      val m = pu.agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      val n = col("n").cast("double")
      val ratio = col("sx") / col("sy")
      val my = col("sy") / n
      val vxx = (col("sxx") - col("sx") * col("sx") / n) / (n - 1)
      val vyy = (col("syy") - col("sy") * col("sy") / n) / (n - 1)
      val vxy = (col("sxy") - col("sx") * col("sy") / n) / (n - 1)
      val se = sqrt((vxx - lit(2.0) * ratio * vxy + ratio * ratio * vyy) /
        (n * my * my))
      m.select(
        col("n"), r6(ratio).as("ratio"), r6(se).as("se"),
        r6(ratio - lit(1.959963984540054) * se).as("ci_lo"),
        r6(ratio + lit(1.959963984540054) * se).as("ci_hi"))
    },
    Some("""WITH pu AS (SELECT user_id, SUM(COALESCE(value, 0.0)) AS x,
           |                   CAST(COUNT(*) AS DOUBLE) AS y
           |            FROM events GROUP BY 1),
           |     m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
           |                  SUM(y) AS sy, SUM(x*x) AS sxx, SUM(y*y) AS syy,
           |                  SUM(x*y) AS sxy
           |           FROM pu)
           |SELECT n, ROUND(sx / sy, 6) AS ratio,
           |       ROUND(SQRT(((sxx - sx*sx/n) / (n-1)
           |                   - 2.0 * (sx/sy) * ((sxy - sx*sy/n) / (n-1))
           |                   + (sx/sy) * (sx/sy) * ((syy - sy*sy/n) / (n-1)))
           |                  / (n * (sy/n) * (sy/n))), 6) AS se,
           |       ROUND(sx / sy - 1.959963984540054 *
           |             SQRT(((sxx - sx*sx/n) / (n-1)
           |                   - 2.0 * (sx/sy) * ((sxy - sx*sy/n) / (n-1))
           |                   + (sx/sy) * (sx/sy) * ((syy - sy*sy/n) / (n-1)))
           |                  / (n * (sy/n) * (sy/n))), 6) AS ci_lo,
           |       ROUND(sx / sy + 1.959963984540054 *
           |             SQRT(((sxx - sx*sx/n) / (n-1)
           |                   - 2.0 * (sx/sy) * ((sxy - sx*sy/n) / (n-1))
           |                   + (sx/sy) * (sx/sy) * ((syy - sy*sy/n) / (n-1)))
           |                  / (n * (sy/n) * (sy/n))), 6) AS ci_hi
           |FROM m""".stripMargin))

  /** Q329 — Kruskal-Wallis H across three md5 segments of per-user
    * activity: the k-group extension of q324's rank test (one-way ANOVA
    * without normality). Same midrank-on-the-bounded-value-grid
    * discipline — the data-sized work is one keyed aggregation onto the
    * (value, segment) grid; doubled midranks keep every per-segment rank
    * sum BIGINT-exact until the final H combine. Tie-corrected:
    * H / (1 − Σ(t³−t)/(N³−N)). */
  val q329 = QueryDef(
    "q329_kruskal_wallis",
    (s, d) => {
      import graft.core.Windows
      val W = org.apache.spark.sql.expressions.Window
      val pu = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("v"))
        .select(
          col("v"),
          (conv(substring(md5(concat(lit("kw-v1:"), col("user_id").cast("string"))),
            1, 4), 16, 10).cast("int") % 3).as("seg"))
      val grid = pu.groupBy("v", "seg").agg(count(lit(1)).as("n_gv"))
      val marginal = grid.groupBy("v").agg(sum("n_gv").as("n_v"))
      val before = Windows.bounded(col("v")).rowsBetween(W.unboundedPreceding, -1)
      val mid = marginal
        .withColumn("mid2",
          lit(2L) * coalesce(sum(col("n_v")).over(before), lit(0L)) +
            col("n_v") + lit(1L))
      val perSeg = grid.join(mid, "v")
        .groupBy("seg")
        .agg(sum("n_gv").as("n_g"), sum(col("n_gv") * col("mid2")).as("r2g"))
      val tot = mid.agg(
        sum("n_v").as("n"),
        sum(col("n_v") * col("n_v") * col("n_v") - col("n_v")).as("ties"))
      val h = perSeg.crossJoin(broadcast(tot))
        .groupBy("n", "ties")
        .agg(
          count(lit(1)).as("k"),
          sum((col("r2g").cast("double") / 2.0) * (col("r2g").cast("double") / 2.0) /
            col("n_g")).as("srr"))
      h.select(
        col("k").cast("long").as("k_groups"), col("n"),
        r6((lit(12.0) / (col("n").cast("double") * (col("n") + 1)) * col("srr") -
          lit(3.0) * (col("n") + 1)) /
          (lit(1.0) - col("ties").cast("double") /
            (col("n").cast("double") * col("n") * col("n") - col("n"))))
          .as("h_stat"))
    },
    Some("""WITH pu AS (SELECT CAST(('0x' || substr(md5('kw-v1:' ||
           |                     CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 3 AS seg,
           |                   COUNT(*) AS v
           |            FROM events GROUP BY user_id),
           |     g AS (SELECT v, seg, COUNT(*) AS n_gv FROM pu GROUP BY 1, 2),
           |     mg AS (SELECT v, SUM(n_gv) AS n_v FROM g GROUP BY 1),
           |     mid AS (SELECT v, n_v,
           |                    2 * COALESCE(SUM(n_v) OVER (ORDER BY v
           |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |                      + n_v + 1 AS mid2
           |             FROM mg),
           |     ps AS (SELECT seg, CAST(SUM(n_gv) AS BIGINT) AS n_g,
           |                   CAST(SUM(n_gv * mid2) AS BIGINT) AS r2g
           |            FROM g JOIN mid USING (v) GROUP BY 1),
           |     t AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n,
           |                  CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS ties
           |           FROM mid),
           |     f AS (SELECT t.n, t.ties, COUNT(*) AS k,
           |                  SUM((CAST(r2g AS DOUBLE) / 2.0)
           |                      * (CAST(r2g AS DOUBLE) / 2.0) / n_g) AS srr
           |           FROM ps CROSS JOIN t GROUP BY 1, 2)
           |SELECT CAST(k AS BIGINT) AS k_groups, n,
           |       ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * srr - 3.0 * (n + 1))
           |             / (1.0 - CAST(ties AS DOUBLE)
           |                      / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_stat
           |FROM f""".stripMargin))

  /** Q331 — two-sample Kolmogorov-Smirnov between the md5 arms on
    * per-user activity: "are the DISTRIBUTIONS different at all" — the
    * companion to the mean (q297), rank (q324) and k-group (q329)
    * comparisons that catches variance/shape-only effects all of them
    * miss. Same exact-integer trick as q203's drift monitor, applied
    * two-sample: D = max|cum_a·n_b − cum_b·n_a| / (n_a·n_b), the max
    * taken over BIGINT-exact scaled gaps on the bounded value grid — FP
    * enters only in the final division. Also emits the scaled statistic
    * √(n_a·n_b/N)·D (reject at α=.05 above ~1.358). */
  val q331 = QueryDef(
    "q331_ks_two_sample",
    (s, d) => {
      import graft.core.Windows
      val W = org.apache.spark.sql.expressions.Window
      val pu = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("v"))
        .select(
          col("v"),
          (conv(substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
            1, 4), 16, 10).cast("int") % 2).as("arm"))
      val grid = pu.groupBy("v").agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("na_v"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nb_v"))
      val upTo = Windows.bounded(col("v")).rowsBetween(W.unboundedPreceding, 0)
      val full = Windows.bounded(col("v"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
      grid
        .withColumn("ca", sum(col("na_v")).over(upTo))
        .withColumn("cb", sum(col("nb_v")).over(upTo))
        .withColumn("na", sum(col("na_v")).over(full))
        .withColumn("nb", sum(col("nb_v")).over(full))
        .select(
          col("na"), col("nb"),
          abs(col("ca") * col("nb") - col("cb") * col("na")).as("gap2"))
        .groupBy("na", "nb")
        .agg(max("gap2").as("d2"))
        .select(
          col("na").as("n_a"), col("nb").as("n_b"),
          r6(col("d2").cast("double") / (col("na") * col("nb"))).as("ks_d"),
          r6(sqrt((col("na") * col("nb")).cast("double") / (col("na") + col("nb"))) *
            (col("d2").cast("double") / (col("na") * col("nb")))).as("ks_scaled"))
    },
    Some("""WITH pu AS (SELECT CAST(('0x' || substr(md5('ab-v1:' ||
           |                     CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2 AS arm,
           |                   COUNT(*) AS v
           |            FROM events GROUP BY user_id),
           |     g AS (SELECT v,
           |                  SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS na_v,
           |                  SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS nb_v
           |           FROM pu GROUP BY v),
           |     c AS (SELECT v, na_v, nb_v,
           |                  SUM(na_v) OVER (ORDER BY v
           |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
           |                  SUM(nb_v) OVER (ORDER BY v
           |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
           |                  SUM(na_v) OVER () AS na, SUM(nb_v) OVER () AS nb
           |           FROM g),
           |     f AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           |                  CAST(MAX(ABS(ca * nb - cb * na)) AS BIGINT) AS d2
           |           FROM c GROUP BY 1, 2)
           |SELECT n_a, n_b,
           |       ROUND(CAST(d2 AS DOUBLE) / (n_a * n_b), 6) AS ks_d,
           |       ROUND(SQRT(CAST(n_a * n_b AS DOUBLE) / (n_a + n_b))
           |             * CAST(d2 AS DOUBLE) / (n_a * n_b), 6) AS ks_scaled
           |FROM f""".stripMargin))

  /** Q333 — winsorized mean per arm (10% each tail), computed EXACTLY
    * from the bounded value grid: the robust location estimate heavy-
    * tailed metrics need (one whale user should not decide an
    * experiment). No row-level sort anywhere: per-arm cumulative counts
    * over the grid locate the k-th and (n−k)-th order statistics, tail
    * contributions clamp via LEAST/GREATEST arithmetic on counts, and
    * everything stays BIGINT until the final division. Emits raw vs
    * winsorized mean per arm so the whale influence is the visible
    * delta. */
  val q333 = QueryDef(
    "q333_winsorized_mean",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val pu = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("v"))
        .select(
          col("v"),
          (conv(substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
            1, 4), 16, 10).cast("int") % 2).as("arm"))
      val g = pu.groupBy("arm", "v").agg(count(lit(1)).as("n_v"))
      val before = W.partitionBy("arm").orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
      val full = W.partitionBy("arm")
      val c = g
        .withColumn("cb", coalesce(sum(col("n_v")).over(before), lit(0L)))
        .withColumn("n", sum(col("n_v")).over(full))
        .withColumn("kk", expr("n DIV 10"))
      val w = c.groupBy("arm", "n", "kk").agg(
        sum(col("v") * col("n_v")).as("s_all"),
        sum(col("v") * least(col("n_v"), greatest(lit(0L), col("kk") - col("cb"))))
          .as("s_lo"),
        sum(col("v") * least(col("n_v"),
          greatest(lit(0L), col("kk") - (col("n") - col("cb") - col("n_v")))))
          .as("s_hi"),
        min(when(col("cb") + col("n_v") >= col("kk") + 1, col("v"))).as("v_lo"),
        min(when(col("cb") + col("n_v") >= col("n") - col("kk"), col("v"))).as("v_hi"))
      w.select(
          col("arm"), col("n"), col("kk").as("k_trim"),
          r6((col("s_all") - col("s_lo") - col("s_hi") +
            col("kk") * col("v_lo") + col("kk") * col("v_hi")).cast("double") /
            col("n")).as("winsorized_mean"),
          r6(col("s_all").cast("double") / col("n")).as("raw_mean"))
        .orderBy("arm")
    },
    Some("""WITH pu AS (SELECT CAST(('0x' || substr(md5('ab-v1:' ||
           |                     CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2 AS arm,
           |                   COUNT(*) AS v
           |            FROM events GROUP BY user_id),
           |     g AS (SELECT arm, v, COUNT(*) AS n_v FROM pu GROUP BY 1, 2),
           |     c AS (SELECT arm, v, n_v,
           |                  COALESCE(SUM(n_v) OVER (PARTITION BY arm ORDER BY v
           |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |                    AS cb,
           |                  SUM(n_v) OVER (PARTITION BY arm) AS n
           |           FROM g),
           |     k AS (SELECT arm, v, n_v, cb, n, n // 10 AS kk FROM c),
           |     w AS (SELECT arm, CAST(n AS BIGINT) AS n, CAST(kk AS BIGINT) AS k_trim,
           |                  SUM(v * n_v) AS s_all,
           |                  SUM(v * LEAST(n_v, GREATEST(0, kk - cb))) AS s_lo,
           |                  SUM(v * LEAST(n_v,
           |                      GREATEST(0, kk - (n - cb - n_v)))) AS s_hi,
           |                  MIN(CASE WHEN cb + n_v >= kk + 1 THEN v END) AS v_lo,
           |                  MIN(CASE WHEN cb + n_v >= n - kk THEN v END) AS v_hi
           |           FROM k GROUP BY 1, 2, 3)
           |SELECT CAST(arm AS INTEGER) AS arm, n, k_trim,
           |       ROUND(CAST(s_all - s_lo - s_hi
           |                  + k_trim * v_lo + k_trim * v_hi AS DOUBLE) / n, 6)
           |         AS winsorized_mean,
           |       ROUND(CAST(s_all AS DOUBLE) / n, 6) AS raw_mean
           |FROM w ORDER BY arm""".stripMargin))

  /** Q334 — standardized effect size between arms (Cohen's d with the
    * Hedges small-sample correction): the tests in this family answer
    * "is there a difference"; d answers "is it big enough to matter" —
    * the number a launch review actually reads. d = (x̄₁ − x̄₀)/s_pooled
    * with s²_pooled = ((n₁−1)s₁² + (n₀−1)s₀²)/(n₁+n₀−2), Hedges g =
    * d·(1 − 3/(4(n₁+n₀)−9)). Everything closed-from-sums: one per-arm
    * moment aggregation over per-user order value, two rows reduced to
    * one. */
  val q334 = QueryDef(
    "q334_effect_size",
    (s, d) => {
      val pu = Tables.orders(s, d).groupBy("o_custkey")
        .agg(sum("o_totalprice").as("x"))
        .select(
          col("x"),
          (conv(substring(md5(concat(lit("ab-v1:"), col("o_custkey").cast("string"))),
            1, 4), 16, 10).cast("int") % 2).as("arm"))
      val m = pu.groupBy("arm").agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
      val wide = m.agg(
        sum(when(col("arm") === 1, col("n"))).as("n1"),
        sum(when(col("arm") === 1, col("sx"))).as("s1"),
        sum(when(col("arm") === 1, col("sxx"))).as("q1"),
        sum(when(col("arm") === 0, col("n"))).as("n0"),
        sum(when(col("arm") === 0, col("sx"))).as("s0"),
        sum(when(col("arm") === 0, col("sxx"))).as("q0"))
      val v1 = (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)
      val v0 = (col("q0") - col("s0") * col("s0") / col("n0")) / (col("n0") - 1)
      val sp = sqrt(((col("n1") - 1) * v1 + (col("n0") - 1) * v0) /
        (col("n1") + col("n0") - 2))
      val dEff = (col("s1") / col("n1") - col("s0") / col("n0")) / sp
      wide.select(
        col("n1"), col("n0"),
        (r6(dEff) + lit(0.0)).as("cohens_d"),
        (r6(dEff * (lit(1.0) - lit(3.0) / (lit(4.0) * (col("n1") + col("n0")) - 9)))
          + lit(0.0)).as("hedges_g"),
        r6(sp).as("pooled_sd"))
    },
    Some("""WITH pu AS (SELECT CAST(('0x' || substr(md5('ab-v1:' ||
           |                     CAST(o_custkey AS VARCHAR)), 1, 4)) AS INTEGER) % 2
           |                     AS arm,
           |                   SUM(o_totalprice) AS x
           |            FROM orders GROUP BY o_custkey),
           |     m AS (SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(x*x) AS sxx
           |           FROM pu GROUP BY 1),
           |     w AS (SELECT CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
           |                  SUM(CASE WHEN arm = 1 THEN sx END) AS s1,
           |                  SUM(CASE WHEN arm = 1 THEN sxx END) AS q1,
           |                  CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
           |                  SUM(CASE WHEN arm = 0 THEN sx END) AS s0,
           |                  SUM(CASE WHEN arm = 0 THEN sxx END) AS q0
           |           FROM m),
           |     f AS (SELECT n1, n0,
           |                  (s1 / n1 - s0 / n0)
           |                  / SQRT(((n1 - 1) * ((q1 - s1*s1/n1) / (n1 - 1))
           |                          + (n0 - 1) * ((q0 - s0*s0/n0) / (n0 - 1)))
           |                         / (n1 + n0 - 2)) AS d,
           |                  SQRT(((n1 - 1) * ((q1 - s1*s1/n1) / (n1 - 1))
           |                        + (n0 - 1) * ((q0 - s0*s0/n0) / (n0 - 1)))
           |                       / (n1 + n0 - 2)) AS sp
           |           FROM w)
           |SELECT n1, n0, ROUND(d, 6) + 0 AS cohens_d,
           |       ROUND(d * (1.0 - 3.0 / (4.0 * (n1 + n0) - 9)), 6) + 0 AS hedges_g,
           |       ROUND(sp, 6) AS pooled_sd
           |FROM f""".stripMargin))

  /** Q340 — group-sequential A/B monitoring
    * ([[graft.ops.SequentialTest.obfMonitor]]): the running
    * two-proportion z per look DAY against the O'Brien-Fleming-shaped
    * boundary z_α/2·√(K/k) — the "peek every day without inflating
    * false positives" discipline a fixed-horizon z test evaluated daily
    * destroys. Looks qualify once both arms hold ≥ 30 subjects (alpha is
    * not spent on unstable denominators). Everything is exact integer
    * counts until the final z/boundary arithmetic (cumulative windows of
    * longs over the calendar grid), so both engines compute
    * bit-identical statistics and the `crossed` BOOLEAN itself is
    * oracle-comparable — no knife-edge. The fixture gate is 5/arm (the
    * sf0.001 smoke corpus holds only ~15 subjects; the op's production
    * default stays 30). */
  val q340 = QueryDef(
    "q340_sequential_monitor",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.join(entry, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .select(
          (conv(
            substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
              1, 4), 16, 10).cast("int") % 2).cast("string").as("arm"),
          to_date(timestamp_micros(col("entry_us"))).as("entry_day"),
          to_date(timestamp_micros(col("conv_us"))).as("conv_day"))
      val looks = Tables.events(s, d).select(to_date(col("ts")).as("day")).distinct()
      graft.ops.SequentialTest.obfMonitor(
          subjects, "arm", "entry_day", "conv_day", looks, "day", focal = "1",
          minPerArm = 5L)
        .select(
          col("day").cast("string").as("day"), col("k"),
          col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          (r6(col("z")) + lit(0.0)).as("z"),
          r6(col("boundary")).as("boundary"), col("crossed"))
        .orderBy("day")
    },
    Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
           |                  epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |s AS (SELECT CAST(CAST(('0x' || substr(md5('ab-v1:' ||
           |               CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 2
           |             AS VARCHAR) AS arm,
           |             CAST(make_timestamp(entry_us) AS DATE) AS entry_day,
           |             CASE WHEN conv_us IS NULL THEN NULL
           |                  ELSE CAST(make_timestamp(conv_us) AS DATE) END AS conv_day
           |      FROM en LEFT JOIN cv USING (user_id)),
           |looks AS (SELECT DISTINCT day FROM e),
           |ent AS (SELECT arm, entry_day AS day, COUNT(*) AS en FROM s GROUP BY 1,2),
           |cvv AS (SELECT arm, conv_day AS day, COUNT(*) AS cn FROM s
           |        WHERE conv_day IS NOT NULL GROUP BY 1,2),
           |arms AS (SELECT DISTINCT arm FROM s),
           |grid AS (SELECT a.arm, l.day, COALESCE(en,0) AS en, COALESCE(cn,0) AS cn
           |         FROM looks l CROSS JOIN arms a
           |         LEFT JOIN ent ON ent.arm=a.arm AND ent.day=l.day
           |         LEFT JOIN cvv ON cvv.arm=a.arm AND cvv.day=l.day),
           |cum AS (SELECT arm, day,
           |               SUM(en) OVER (PARTITION BY arm ORDER BY day) AS n,
           |               SUM(cn) OVER (PARTITION BY arm ORDER BY day) AS c
           |        FROM grid),
           |j AS (SELECT a.day, a.n AS n_a, a.c AS conv_a, b.n AS n_b, b.c AS conv_b
           |      FROM cum a JOIN cum b ON a.day = b.day AND a.arm='1' AND b.arm='0'
           |      WHERE a.n >= 5 AND b.n >= 5),
           |q AS (SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS k,
           |             COUNT(*) OVER () AS bigk, n_a, conv_a, n_b, conv_b
           |      FROM j),
           |z AS (SELECT *,
           |             (CAST(conv_a AS DOUBLE)/n_a - CAST(conv_b AS DOUBLE)/n_b)
           |             / NULLIF(SQRT((CAST(conv_a+conv_b AS DOUBLE)/(n_a+n_b))
           |                           * (1.0 - CAST(conv_a+conv_b AS DOUBLE)/(n_a+n_b))
           |                           * (1.0/n_a + 1.0/n_b)), 0.0) AS zz,
           |             1.96 * SQRT(CAST(bigk AS DOUBLE)/k) AS boundary
           |      FROM q)
           |SELECT CAST(day AS VARCHAR) AS day, CAST(k AS BIGINT) AS k,
           |       CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           |       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           |       ROUND(COALESCE(zz, 0.0), 6) + 0 AS z,
           |       ROUND(boundary, 6) AS boundary,
           |       ABS(COALESCE(zz, 0.0)) > boundary AS crossed
           |FROM z ORDER BY day""".stripMargin))

  /** Q307 — difference-in-differences: the 2×2 (arm × period) cell
    * means with the DiD estimate and its large-sample SE — the
    * quasi-experimental counterpart of q297's CUPED (no pre-period
    * covariate model, just the parallel-trends subtraction). One
    * aggregation onto the 4-cell grid; arms from the md5 coin, the
    * period split at the observation midpoint — both engine-replayable.
    * SE = sqrt(Σ var_cell/n_cell) from the same moment sums. */
  val q307 = QueryDef(
    "q307_diff_in_diff",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), unix_micros(col("ts")).as("us"),
        coalesce(col("value"), lit(0.0)).as("v"))
      val mid = ev.agg(expr("(min(us) + max(us)) DIV 2").as("mid_us"))
      val cells = ev.crossJoin(broadcast(mid))
        .select(
          (conv(substring(md5(concat(lit("did-v1:"), col("user_id").cast("string"))),
            1, 4), 16, 10).cast("int") % 2).as("arm"),
          when(col("us") >= col("mid_us"), 1).otherwise(0).as("post"),
          col("v"))
        .groupBy("arm", "post")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"), sum(col("v") * col("v")).as("svv"))
      val m = col("sv") / col("n")
      val varTerm = (col("svv") / col("n") - m * m) / col("n")
      val wide = cells.select(
        when(col("arm") === 1 && col("post") === 1, m).as("m_t1"),
        when(col("arm") === 1 && col("post") === 0, m).as("m_t0"),
        when(col("arm") === 0 && col("post") === 1, m).as("m_c1"),
        when(col("arm") === 0 && col("post") === 0, m).as("m_c0"),
        varTerm.as("vt"))
        .agg(
          first(col("m_t1"), ignoreNulls = true).as("m_t1"),
          first(col("m_t0"), ignoreNulls = true).as("m_t0"),
          first(col("m_c1"), ignoreNulls = true).as("m_c1"),
          first(col("m_c0"), ignoreNulls = true).as("m_c0"),
          sum("vt").as("var_sum"))
      wide.select(
        r6(col("m_t1")).as("mean_treat_post"), r6(col("m_t0")).as("mean_treat_pre"),
        r6(col("m_c1")).as("mean_ctrl_post"), r6(col("m_c0")).as("mean_ctrl_pre"),
        r6(col("m_t1") - col("m_t0") - (col("m_c1") - col("m_c0"))).as("did"),
        r6(sqrt(col("var_sum"))).as("se"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, COALESCE(value, 0) AS v
           |           FROM events),
           |     m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM e),
           |     c AS (SELECT CAST(('0x' || substr(md5('did-v1:' ||
           |                    CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2 AS arm,
           |                  CASE WHEN us >= mid_us THEN 1 ELSE 0 END AS post, v
           |           FROM e CROSS JOIN m),
           |     g AS (SELECT arm, post, COUNT(*) AS n, SUM(v) AS sv,
           |                  SUM(v*v) AS svv
           |           FROM c GROUP BY 1, 2),
           |     w AS (SELECT
           |             MAX(CASE WHEN arm=1 AND post=1 THEN sv/n END) AS m_t1,
           |             MAX(CASE WHEN arm=1 AND post=0 THEN sv/n END) AS m_t0,
           |             MAX(CASE WHEN arm=0 AND post=1 THEN sv/n END) AS m_c1,
           |             MAX(CASE WHEN arm=0 AND post=0 THEN sv/n END) AS m_c0,
           |             SUM((svv/n - (sv/n)*(sv/n)) / n) AS var_sum
           |           FROM g)
           |SELECT ROUND(m_t1, 6) AS mean_treat_post, ROUND(m_t0, 6) AS mean_treat_pre,
           |       ROUND(m_c1, 6) AS mean_ctrl_post, ROUND(m_c0, 6) AS mean_ctrl_pre,
           |       ROUND(m_t1 - m_t0 - (m_c1 - m_c0), 6) + 0 AS did,
           |       ROUND(SQRT(var_sum), 6) AS se
           |FROM w""".stripMargin))

  /** Q315 — dispersion index of daily volumes per event type
    * (variance-to-mean ratio): the is-it-really-Poisson check that
    * decides whether q269-style count models or rate alarms can assume
    * Var = Mean — bursty types (D ≫ 1, overdispersed) need negative-
    * binomial-grade thresholds, not Poisson ones. Closed-from-sums on
    * the calendar-bounded daily grid. */
  val q315 = QueryDef(
    "q315_dispersion_index",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val m = col("sc") / col("n")
      daily.groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("cnt")).as("sc"),
          sum(col("cnt") * col("cnt")).as("scc"))
        .select(
          col("event_type"), col("n").as("n_days"),
          r6(m).as("mean_daily"),
          r6(col("scc") / col("n") - m * m).as("var_daily"),
          r6((col("scc") / col("n") - m * m) / m).as("dispersion"),
          ((col("scc") / col("n") - m * m) / m > 1.5).as("overdispersed"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
           |                      COUNT(*) AS cnt
           |               FROM events GROUP BY 1, 2),
           |     g AS (SELECT event_type, COUNT(*) AS n,
           |                  CAST(SUM(cnt) AS BIGINT) AS sc,
           |                  CAST(SUM(cnt * cnt) AS BIGINT) AS scc
           |           FROM daily GROUP BY 1)
           |SELECT event_type, n AS n_days,
           |       ROUND(CAST(sc AS DOUBLE) / n, 6) AS mean_daily,
           |       ROUND(CAST(scc AS DOUBLE) / n
           |             - (CAST(sc AS DOUBLE)/n) * (CAST(sc AS DOUBLE)/n), 6)
           |         AS var_daily,
           |       ROUND((CAST(scc AS DOUBLE) / n
           |              - (CAST(sc AS DOUBLE)/n) * (CAST(sc AS DOUBLE)/n))
           |             / (CAST(sc AS DOUBLE) / n), 6) AS dispersion,
           |       (CAST(scc AS DOUBLE) / n
           |        - (CAST(sc AS DOUBLE)/n) * (CAST(sc AS DOUBLE)/n))
           |         / (CAST(sc AS DOUBLE) / n) > 1.5 AS overdispersed
           |FROM g ORDER BY event_type""".stripMargin))

  /** Q316 — weekday seasonality STRENGTH per event type: the share of
    * daily-volume variance explained by day-of-week means (the one-way
    * ANOVA η² on the calendar grid) — the number that decides whether
    * q251's seasonal adjustment is worth applying before q200/q292-style
    * monitoring. Between-group and total sums of squares both derive
    * from ONE (type, dow) grid of (n, Σ, Σ²) — no second scan, grids
    * bounded by types × 7. */
  val q316 = QueryDef(
    "q316_seasonality_strength",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(
          col("event_type"), to_date(col("ts")).as("day"),
          dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("cnt"))
      val cells = daily.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n"), sum("cnt").as("sc"),
          sum(col("cnt") * col("cnt")).as("scc"))
      val m = col("sc_t") / col("n_t")
      cells.groupBy("event_type")
        .agg(
          sum("n").as("n_t"), sum("sc").as("sc_t"), sum("scc").as("scc_t"),
          sum(col("sc") * col("sc") / col("n")).as("sgs"))
        .select(
          col("event_type"), col("n_t").as("n_days"),
          r6((col("sgs") - col("sc_t") * m) /
            (col("scc_t") - col("sc_t") * m)).as("eta_sq"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
           |                      dayofweek(ts) + 1 AS dow, COUNT(*) AS cnt
           |               FROM events GROUP BY 1, 2, 3),
           |     cells AS (SELECT event_type, dow, COUNT(*) AS n,
           |                      CAST(SUM(cnt) AS BIGINT) AS sc,
           |                      CAST(SUM(cnt * cnt) AS BIGINT) AS scc
           |               FROM daily GROUP BY 1, 2),
           |     g AS (SELECT event_type,
           |                  CAST(SUM(n) AS BIGINT) AS n_t,
           |                  CAST(SUM(sc) AS BIGINT) AS sc_t,
           |                  CAST(SUM(scc) AS BIGINT) AS scc_t,
           |                  SUM(CAST(sc AS DOUBLE) * sc / n) AS sgs
           |           FROM cells GROUP BY 1)
           |SELECT event_type, n_t AS n_days,
           |       ROUND((sgs - sc_t * (CAST(sc_t AS DOUBLE) / n_t))
           |             / (scc_t - sc_t * (CAST(sc_t AS DOUBLE) / n_t)), 6) AS eta_sq
           |FROM g ORDER BY event_type""".stripMargin))

  /** Q317 — revenue trend per market segment: grouped OLS (q298's
    * closed-from-sums) of weekly order totals on the week index — five
    * trend lines from one keyed moment aggregation over a broadcast
    * customer join, the "which segment is growing" readout. Weeks are
    * integer epoch-day DIV 7 and revenue is summed in integer CENTS, so
    * every regression sum is EXACT — a raw double mean here actually
    * hash-failed on a ROUND(4) half-point during development (the
    * cross-engine sum-order class the exact-integer discipline
    * exists for). */
  val q317 = QueryDef(
    "q317_segment_trend",
    (s, d) => {
      val weekly = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(
          col("c_mktsegment").as("segment"),
          expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') DIV 7").as("wk"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
      val sums = weekly.groupBy("segment").agg(
        count(lit(1)).as("n"),
        sum("wk").as("sx"), sum("rev_c").as("sy"),
        sum(col("wk") * col("rev_c")).as("sxy"),
        sum(col("wk") * col("wk")).as("sxx"))
      val slope = (col("sxy") - col("sx").cast("double") * col("sy") / col("n")) /
        (col("sxx") - col("sx").cast("double") * col("sx") / col("n")) / lit(100.0)
      sums.select(
        col("segment"), col("n").as("n_weeks"),
        r4(col("sy").cast("double") / col("n") / lit(100.0)).as("mean_weekly_rev"),
        r4(slope).as("trend_per_week"))
        .orderBy("segment")
    },
    Some("""WITH w AS (SELECT c_mktsegment AS segment,
           |                  date_diff('day', DATE '1970-01-01',
           |                            CAST(o_orderdate AS DATE)) // 7 AS wk,
           |                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
           |                       AS BIGINT) AS rev_c
           |           FROM orders JOIN customer ON o_custkey = c_custkey
           |           GROUP BY 1, 2),
           |     m AS (SELECT segment, COUNT(*) AS n,
           |                  CAST(SUM(wk) AS BIGINT) AS sx,
           |                  CAST(SUM(rev_c) AS BIGINT) AS sy,
           |                  CAST(SUM(wk * rev_c) AS BIGINT) AS sxy,
           |                  CAST(SUM(wk * wk) AS BIGINT) AS sxx
           |           FROM w GROUP BY 1)
           |SELECT segment, n AS n_weeks,
           |       ROUND(CAST(sy AS DOUBLE) / n / 100.0, 4) AS mean_weekly_rev,
           |       ROUND((sxy - CAST(sx AS DOUBLE) * sy / n)
           |             / (sxx - CAST(sx AS DOUBLE) * sx / n) / 100.0, 4)
           |         AS trend_per_week
           |FROM m ORDER BY segment""".stripMargin))

  /** Q318 — weekly brand concentration (Herfindahl-Hirschman index):
    * Σ share² of brand revenue per week — the market-concentration
    * complement to q204/q306's user-level inequality (HHI > 0.25 reads
    * "concentrated" in antitrust practice). Shares derive from the
    * (week, brand) grid and its week rollup — two keyed aggregations
    * over a broadcast part join, never a window over data. */
  val q318 = QueryDef(
    "q318_weekly_hhi",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(
          expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') DIV 7").as("wk"),
          col("p_brand"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val weekTot = li.groupBy("wk").agg(
        sum("rev").as("tot"), count(lit(1)).as("n_brands"))
      li.join(weekTot, "wk")
        .groupBy("wk", "n_brands")
        .agg(r6(sum((col("rev") / col("tot")) * (col("rev") / col("tot")))).as("hhi"))
        .select(col("wk").as("week"), col("n_brands"), col("hhi"))
        .orderBy("week")
    },
    Some("""WITH b AS (SELECT date_diff('day', DATE '1970-01-01',
           |                            CAST(l_shipdate AS DATE)) // 7 AS wk,
           |                  p_brand, SUM(l_extendedprice) AS rev
           |           FROM lineitem JOIN part ON l_partkey = p_partkey
           |           GROUP BY 1, 2),
           |     t AS (SELECT wk, SUM(rev) AS tot, COUNT(*) AS n_brands
           |           FROM b GROUP BY 1)
           |SELECT b.wk AS week, CAST(t.n_brands AS BIGINT) AS n_brands,
           |       ROUND(SUM((b.rev / t.tot) * (b.rev / t.tot)), 6) AS hhi
           |FROM b JOIN t USING (wk)
           |GROUP BY 1, 2 ORDER BY 1""".stripMargin))

  /** Q341 — Welch's one-way ANOVA (Welch 1951): do the k = 25 nations'
    * customer balances share a mean, WITHOUT assuming equal variances
    * (classic ANOVA's equal-variance assumption is exactly what skewed
    * per-group financial data violates) — the parametric companion to
    * q329's rank-based Kruskal-Wallis. Everything closed-from-moments:
    * one per-nation (n, Σx, Σx²) aggregation, then the weighted F*
    * statistic and Welch–Satterthwaite df over the 25-row grid — the
    * grid reduce is itself one aggregation, no driver state, no
    * collect. */
  val q341 = QueryDef(
    "q341_welch_anova",
    (s, d) => {
      val g = Tables.customer(s, d).groupBy(col("c_nationkey").as("g"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("c_acctbal")).as("sx"),
          sum(col("c_acctbal") * col("c_acctbal")).as("sxx"))
        .select(
          col("g"), col("n"),
          (col("sx") / col("n")).as("m"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("s2"))
        .withColumn("w", col("n") / col("s2"))
      val red = g.agg(
        count(lit(1)).cast("double").as("k"),
        sum(col("n")).as("ntot"),
        sum(col("w")).as("bigw"),
        sum(col("w") * col("m")).as("wm"))
      val joined = g.crossJoin(broadcast(red))
        .agg(
          first(col("k")).as("k"),
          first(col("ntot")).as("ntot"),
          sum(col("w") * (col("m") - col("wm") / col("bigw"))
            * (col("m") - col("wm") / col("bigw"))).as("num"),
          sum((lit(1.0) - col("w") / col("bigw"))
            * (lit(1.0) - col("w") / col("bigw")) / (col("n") - 1)).as("lam"))
      joined.select(
        col("k").cast("long").as("k_groups"),
        col("ntot").cast("long").as("n"),
        r6((col("num") / (col("k") - 1)) /
          (lit(1.0) + lit(2.0) * (col("k") - 2) / (col("k") * col("k") - 1) * col("lam")))
          .as("f_stat"),
        r6((col("k") * col("k") - 1) / (lit(3.0) * col("lam"))).as("df2"))
    },
    Some("""WITH g AS (SELECT c_nationkey AS g, CAST(COUNT(*) AS DOUBLE) AS n,
           |                  SUM(c_acctbal) AS sx, SUM(c_acctbal * c_acctbal) AS sxx
           |           FROM customer GROUP BY 1),
           |m AS (SELECT g, n, sx / n AS m,
           |             (sxx - sx * sx / n) / (n - 1) AS s2
           |      FROM g),
           |w AS (SELECT g, n, m, n / s2 AS w FROM m),
           |r AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(n) AS ntot,
           |             SUM(w) AS bigw, SUM(w * m) AS wm
           |      FROM w),
           |f AS (SELECT r.k, r.ntot,
           |             SUM(w * (m - wm / bigw) * (m - wm / bigw)) AS num,
           |             SUM((1.0 - w / bigw) * (1.0 - w / bigw) / (n - 1)) AS lam
           |      FROM w CROSS JOIN r GROUP BY 1, 2)
           |SELECT CAST(k AS BIGINT) AS k_groups, CAST(ntot AS BIGINT) AS n,
           |       ROUND((num / (k - 1))
           |             / (1.0 + 2.0 * (k - 2) / (k * k - 1) * lam), 6) AS f_stat,
           |       ROUND((k * k - 1) / (3.0 * lam), 6) AS df2
           |FROM f""".stripMargin))

  /** Q342 — always-valid p-values (mixture SPRT — Johari, Pekelis &
    * Walsh 2017) over q340's look grid
    * ([[graft.ops.SequentialTest.alwaysValidP]]): p_k = min(1,
    * e^{−max_{j≤k} ln Λ_j}) stays a valid p-value under CONTINUOUS
    * monitoring with no pre-declared look schedule — the property
    * q340's OBF boundary buys only for fixed looks. Carried in LOG form
    * (ln Λ is rounding-comparable across engines; Λ itself reaches
    * e^50-scale where 1e-6 rounding is below one ulp) and nonincreasing
    * by construction, so a dashboard ships it directly. Same cumulative
    * exact-integer grid as q340; the oracle extends that replay with
    * ln Λ and the running max. */
  val q342 = QueryDef(
    "q342_always_valid_p",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.join(entry, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .select(
          (conv(
            substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
              1, 4), 16, 10).cast("int") % 2).cast("string").as("arm"),
          to_date(timestamp_micros(col("entry_us"))).as("entry_day"),
          to_date(timestamp_micros(col("conv_us"))).as("conv_day"))
      val looks = Tables.events(s, d).select(to_date(col("ts")).as("day")).distinct()
      val monitor = graft.ops.SequentialTest.obfMonitor(
        subjects, "arm", "entry_day", "conv_day", looks, "day", focal = "1",
        minPerArm = 5L)
      graft.ops.SequentialTest.alwaysValidP(monitor, tau = 0.1)
        .select(
          col("day").cast("string").as("day"), col("k"),
          col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          (r6(col("log_lambda")) + lit(0.0)).as("log_lambda"),
          r6(col("p_always_valid")).as("p_always_valid"))
        .orderBy("day")
    },
    Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
           |                  epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |s AS (SELECT CAST(CAST(('0x' || substr(md5('ab-v1:' ||
           |               CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 2
           |             AS VARCHAR) AS arm,
           |             CAST(make_timestamp(entry_us) AS DATE) AS entry_day,
           |             CASE WHEN conv_us IS NULL THEN NULL
           |                  ELSE CAST(make_timestamp(conv_us) AS DATE) END AS conv_day
           |      FROM en LEFT JOIN cv USING (user_id)),
           |looks AS (SELECT DISTINCT day FROM e),
           |ent AS (SELECT arm, entry_day AS day, COUNT(*) AS en FROM s GROUP BY 1,2),
           |cvv AS (SELECT arm, conv_day AS day, COUNT(*) AS cn FROM s
           |        WHERE conv_day IS NOT NULL GROUP BY 1,2),
           |arms AS (SELECT DISTINCT arm FROM s),
           |grid AS (SELECT a.arm, l.day, COALESCE(en,0) AS en, COALESCE(cn,0) AS cn
           |         FROM looks l CROSS JOIN arms a
           |         LEFT JOIN ent ON ent.arm=a.arm AND ent.day=l.day
           |         LEFT JOIN cvv ON cvv.arm=a.arm AND cvv.day=l.day),
           |cum AS (SELECT arm, day,
           |               SUM(en) OVER (PARTITION BY arm ORDER BY day) AS n,
           |               SUM(cn) OVER (PARTITION BY arm ORDER BY day) AS c
           |        FROM grid),
           |j AS (SELECT a.day, a.n AS n_a, a.c AS conv_a, b.n AS n_b, b.c AS conv_b
           |      FROM cum a JOIN cum b ON a.day = b.day AND a.arm='1' AND b.arm='0'
           |      WHERE a.n >= 5 AND b.n >= 5),
           |q AS (SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS k,
           |             n_a, conv_a, n_b, conv_b,
           |             CAST(conv_a AS DOUBLE)/n_a AS pa,
           |             CAST(conv_b AS DOUBLE)/n_b AS pb
           |      FROM j),
           |v AS (SELECT *,
           |             pa*(1.0-pa)/n_a + pb*(1.0-pb)/n_b AS vv,
           |             0.01 AS t2
           |      FROM q),
           |ll AS (SELECT *,
           |              CASE WHEN vv > 0.0
           |                   THEN 0.5*LN(vv/(vv+t2))
           |                        + (pa-pb)*(pa-pb)*t2/(2.0*vv*(vv+t2))
           |                   ELSE 0.0 END AS log_lambda
           |       FROM v),
           |p AS (SELECT *,
           |             LEAST(1.0, EXP(-MAX(log_lambda) OVER (ORDER BY day
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
           |               AS pav
           |      FROM ll)
           |SELECT CAST(day AS VARCHAR) AS day, CAST(k AS BIGINT) AS k,
           |       CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           |       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           |       ROUND(log_lambda, 6) + 0 AS log_lambda,
           |       ROUND(pav, 6) AS p_always_valid
           |FROM p ORDER BY day""".stripMargin))

  /** Q350 — sample-ratio-mismatch check ([[graft.ops.Contingency.srm]]):
    * the assignment-integrity gate that must run BEFORE any experiment
    * readout — chi-square goodness-of-fit of the md5-coin THREE-way
    * split against its declared ⅓/⅓/⅓ allocation, alarm at p < 0.001
    * (the deliberately strict platform convention: assignment is
    * supposed to be exactly right). One keyed aggregation to the arm
    * grid, broadcast join to the declared ratios, grid-sized
    * arithmetic; the upper-tail p via Wilson-Hilferty + the same fixed
    * A&S polynomial as q326/q294 — every step replayed by the oracle,
    * so a wrong expected count, a wrong dof, or a drifting cube-root
    * normalization hash-fails. */
  val q350 = QueryDef(
    "q350_srm_check",
    (s, d) => {
      val subjects = Tables.events(s, d)
        .select(col("user_id")).distinct()
        .select(concat(lit("arm"),
          conv(substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
            1, 4), 16, 10).cast("int") % 3).as("arm"))
      graft.ops.Contingency.srm(subjects, "arm",
          Seq("arm0" -> (1.0 / 3.0), "arm1" -> (1.0 / 3.0), "arm2" -> (1.0 / 3.0)))
        .select(
          col("n"), col("dof"),
          r6(col("chi2")).as("chi2"),
          r6(col("p_srm")).as("p_srm"),
          col("srm"))
    },
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
           |a AS (SELECT CAST(('0x' || substr(md5('ab-v1:' ||
           |             CAST(user_id AS VARCHAR)),1,4)) AS INTEGER) % 3 AS armbit
           |      FROM u),
           |g AS (SELECT armbit, COUNT(*) AS obs FROM a GROUP BY 1),
           |t AS (SELECT SUM(obs) AS n, COUNT(*) AS k FROM g),
           |c AS (SELECT t.n, t.k,
           |             SUM((g.obs - CAST(t.n AS DOUBLE)*(1.0/3.0))
           |                 * (g.obs - CAST(t.n AS DOUBLE)*(1.0/3.0))
           |                 / (CAST(t.n AS DOUBLE)*(1.0/3.0))) AS chi2
           |      FROM g, t GROUP BY t.n, t.k),
           |z AS (SELECT n, k, chi2,
           |             (POWER(chi2/(k-1.0), 1.0/3.0)
           |              - (1.0 - 2.0/(9.0*(k-1.0)))) / SQRT(2.0/(9.0*(k-1.0))) AS zv
           |      FROM c),
           |p AS (SELECT n, k, chi2, zv,
           |             2.0 * (EXP(-ABS(zv)*ABS(zv)/2.0) / SQRT(2.0*PI())
           |               * (0.319381530 * (1.0/(1.0+0.2316419*ABS(zv)))
           |                  - 0.356563782 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 2)
           |                  + 1.781477937 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 3)
           |                  - 1.821255978 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 4)
           |                  + 1.330274429 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 5)))
           |               AS ptwo
           |      FROM z)
           |SELECT CAST(n AS BIGINT) AS n, CAST(k - 1 AS BIGINT) AS dof,
           |       ROUND(chi2, 6) AS chi2,
           |       ROUND(CASE WHEN zv >= 0 THEN ptwo/2.0 ELSE 1.0 - ptwo/2.0 END, 6)
           |         AS p_srm,
           |       (CASE WHEN zv >= 0 THEN ptwo/2.0 ELSE 1.0 - ptwo/2.0 END) < 0.001
           |         AS srm
           |FROM p""".stripMargin))

  /** Q352 — experiment power/MDE design
    * ([[graft.ops.PowerAnalysis.mdeTwoSample]]): "what relative lift can
    * an A/B over THESE users detect at α=0.05 / power 0.8, and how many
    * users does a 2% lift need" — the design arithmetic every test must
    * clear before it runs (an underpowered 'win' overstates the effect;
    * q340's sequential machinery contains peeking, this contains
    * wishful sizing). ONE aggregation over the per-user activity frame
    * (single row out), then closed-form column arithmetic; Φ⁻¹ via the
    * fixed A&S 26.2.23 rational polynomial — replayed digit-for-digit
    * by the oracle, so a wrong constant, a wrong design-variance factor,
    * or a floor-vs-ceil on required n hash-fails. */
  val q352 = QueryDef(
    "q352_power_mde",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).cast("double").as("v"))
      graft.ops.PowerAnalysis.mdeTwoSample(perUser, "v")
        .select(
          col("n"), r6(col("mean")).as("mean"),
          r6(col("variance")).as("variance"),
          r6(col("z_alpha")).as("z_alpha"), r6(col("z_power")).as("z_power"),
          r6(col("mde_abs")).as("mde_abs"), r6(col("mde_rel")).as("mde_rel"),
          col("n_needed"))
    },
    Some("""WITH pu AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS v
           |            FROM events GROUP BY 1),
           |a AS (SELECT COUNT(v) AS n, AVG(v) AS mean, VAR_SAMP(v) AS variance
           |      FROM pu),
           |ps AS (SELECT 'a' AS role, SQRT(-2.0*LN(0.025)) AS t
           |       UNION ALL SELECT 'b', SQRT(-2.0*LN(0.2))),
           |zs AS (SELECT role,
           |              t - (2.515517 + 0.802853*t + 0.010328*t*t)
           |                  / (1.0 + 1.432788*t + 0.189269*t*t + 0.001308*t*t*t)
           |                AS z
           |       FROM ps),
           |zz AS (SELECT MAX(CASE WHEN role='a' THEN z END) AS za,
           |              MAX(CASE WHEN role='b' THEN z END) AS zb
           |       FROM zs)
           |SELECT CAST(n AS BIGINT) AS n, ROUND(mean, 6) AS mean,
           |       ROUND(variance, 6) AS variance,
           |       ROUND(za, 6) AS z_alpha, ROUND(zb, 6) AS z_power,
           |       ROUND((za+zb)*SQRT(variance*4.0/n), 6) AS mde_abs,
           |       ROUND((za+zb)*SQRT(variance*4.0/n)/mean, 6) AS mde_rel,
           |       CAST(CEIL((za+zb)*(za+zb)*variance*4.0
           |                 /((0.02*mean)*(0.02*mean))) AS BIGINT) AS n_needed
           |FROM a, zz""".stripMargin))

  /** Q361 — CLUSTER-randomized design arithmetic
    * ([[graft.ops.PowerAnalysis.mdeTwoSampleClustered]], VERDICT r15
    * item 2): the q352 MDE/required-n pair made honest for experiments
    * that assign whole clusters (users fold into geo clusters,
    * user_id mod 53) — the cluster-robust variance of the overall mean
    * (the same Liang-Zeger fold as q360) replaces σ²/n, the design
    * effect deff = V̂_cl·n/σ² quantifies how much each extra subject is
    * discounted, and the required totals come back in BOTH units
    * (subjects AND clusters). Two aggregations (cluster grid, then
    * global), closed-form column arithmetic, the shared fixed A&S
    * 26.2.23 probit — the oracle replays the cluster fold and every
    * design formula term for term. */
  val q361 = QueryDef(
    "q361_mde_cluster",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).cast("double").as("v"))
        .withColumn("cl", col("user_id") % 53)
      graft.ops.PowerAnalysis.mdeTwoSampleClustered(perUser, "v", "cl")
        .select(
          col("n"), col("m"), r6(col("mean")).as("mean"),
          r6(col("variance")).as("variance"),
          r6(col("var_cluster_mean")).as("var_cluster_mean"),
          r6(col("deff")).as("deff"),
          r6(col("z_alpha")).as("z_alpha"), r6(col("z_power")).as("z_power"),
          r6(col("mde_abs")).as("mde_abs"), r6(col("mde_rel")).as("mde_rel"),
          col("n_needed"), col("m_needed"))
    },
    Some("""WITH pu AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS v
           |            FROM events GROUP BY 1),
           |cg AS (SELECT user_id % 53 AS cl, COUNT(v) AS n_c,
           |              SUM(v) AS s_c, SUM(v*v) AS ss_c
           |       FROM pu GROUP BY 1),
           |a AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n,
           |             CAST(COUNT(*) AS BIGINT) AS m,
           |             SUM(s_c) AS sy, SUM(ss_c) AS syy,
           |             SUM(s_c*s_c) AS cyy, SUM(s_c*n_c) AS cyn,
           |             SUM(CAST(n_c*n_c AS DOUBLE)) AS nn
           |      FROM cg),
           |ps AS (SELECT 'a' AS role, SQRT(-2.0*LN(0.025)) AS t
           |       UNION ALL SELECT 'b', SQRT(-2.0*LN(0.2))),
           |zs AS (SELECT role,
           |              t - (2.515517 + 0.802853*t + 0.010328*t*t)
           |                  / (1.0 + 1.432788*t + 0.189269*t*t + 0.001308*t*t*t)
           |                AS z
           |       FROM ps),
           |zz AS (SELECT MAX(CASE WHEN role='a' THEN z END) AS za,
           |              MAX(CASE WHEN role='b' THEN z END) AS zb
           |       FROM zs),
           |c AS (SELECT *, sy/n AS mean,
           |        (syy - sy*sy/n)/(n - 1) AS variance,
           |        CAST(m AS DOUBLE)/(m - 1) *
           |          (cyy - 2.0*(sy/n)*cyn + (sy/n)*(sy/n)*nn) /
           |          (CAST(n AS DOUBLE)*n) AS vcm
           |      FROM a),
           |c2 AS (SELECT *,
           |        CAST(CEIL((za+zb)*(za+zb)*n*vcm*4.0
           |                  /((0.02*mean)*(0.02*mean))) AS BIGINT) AS n_needed
           |       FROM c, zz)
           |SELECT n, m, ROUND(mean, 6) AS mean, ROUND(variance, 6) AS variance,
           |       ROUND(vcm, 6) AS var_cluster_mean,
           |       ROUND(vcm*n/variance, 6) AS deff,
           |       ROUND(za, 6) AS z_alpha, ROUND(zb, 6) AS z_power,
           |       ROUND((za+zb)*SQRT(vcm*4.0), 6) AS mde_abs,
           |       ROUND((za+zb)*SQRT(vcm*4.0)/mean, 6) AS mde_rel,
           |       n_needed,
           |       CAST(CEIL(n_needed*m/n) AS BIGINT) AS m_needed
           |FROM c2""".stripMargin))

  /** Q353 — treatment-effect homogeneity across segments
    * ([[graft.ops.Hte.homogeneity]]): the subgroup-fishing gate — the
    * inverse-variance pooled lift of the md5-coin arms' 1-DAY conversion
    * across two md5 segments, with Cochran's Q ~ χ²(k−1) and I². A
    * significant Q says "the pooled number is not the story"; reading
    * per-segment lifts without it is how false subgroup wins ship. One
    * conditional keyed aggregation to the segment grid, grid-sized
    * arithmetic, the shared Wilson-Hilferty + A&S upper tail — every
    * step (weights, one-pass Q form, I² clamp) replayed by the oracle. */
  val q353 = QueryDef(
    "q353_hte_homogeneity",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.filter(col("event_type") === "purchase")
        .join(entry, "user_id")
        .filter(col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .select(
          concat(lit("seg"),
            conv(substring(md5(concat(lit("seg-v1:"), col("user_id").cast("string"))),
              1, 4), 16, 10).cast("int") % 2).as("segment"),
          when((conv(substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
            1, 4), 16, 10).cast("int") % 2) === 1, lit("treat")).otherwise(lit("ctrl"))
            .as("arm"),
          (col("conv_us").isNotNull &&
            (col("conv_us") - col("entry_us")) / lit(86400000000L) < 1)
            .cast("int").as("conv"))
      graft.ops.Hte.homogeneity(subjects, "segment", "arm", "conv", focal = "treat")
        .select(
          col("k"), r6(col("pooled_delta")).as("pooled_delta"),
          r6(col("q_stat")).as("q_stat"), col("dof"),
          r6(col("p_homogeneity")).as("p_homogeneity"),
          r6(col("i2")).as("i2"), col("heterogeneous"))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |s AS (SELECT
           |        CAST(('0x' || substr(md5('seg-v1:' ||
           |          CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 2 AS seg,
           |        CAST(('0x' || substr(md5('ab-v1:' ||
           |          CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 2 AS armbit,
           |        CASE WHEN conv_us IS NOT NULL
           |              AND (conv_us - entry_us) // 86400000000 < 1
           |             THEN 1 ELSE 0 END AS conv
           |      FROM en LEFT JOIN cv USING (user_id)),
           |g AS (SELECT seg,
           |             SUM(CASE WHEN armbit=1 THEN 1 ELSE 0 END) AS n_f,
           |             SUM(CASE WHEN armbit=1 THEN conv ELSE 0 END) AS s_f,
           |             SUM(CASE WHEN armbit=0 THEN 1 ELSE 0 END) AS n_c,
           |             SUM(CASE WHEN armbit=0 THEN conv ELSE 0 END) AS s_c
           |      FROM s GROUP BY 1),
           |w AS (SELECT seg,
           |             CAST(s_f AS DOUBLE)/n_f - CAST(s_c AS DOUBLE)/n_c AS delta,
           |             1.0 / ((CAST(s_f AS DOUBLE)/n_f)*(1.0 - CAST(s_f AS DOUBLE)/n_f)/n_f
           |                    + (CAST(s_c AS DOUBLE)/n_c)*(1.0 - CAST(s_c AS DOUBLE)/n_c)/n_c)
           |               AS wt
           |      FROM g),
           |p AS (SELECT COUNT(*) AS k,
           |             SUM(wt*delta) AS swd, SUM(wt) AS sw,
           |             SUM(wt*delta*delta) AS swd2
           |      FROM w),
           |q AS (SELECT k, swd/sw AS pooled_delta,
           |             swd2 - swd*swd/sw AS qs, k - 1.0 AS nu
           |      FROM p),
           |z AS (SELECT k, pooled_delta, qs, nu,
           |             (POWER(qs/nu, 1.0/3.0) - (1.0 - 2.0/(9.0*nu)))
           |               / SQRT(2.0/(9.0*nu)) AS zv
           |      FROM q),
           |pp AS (SELECT k, pooled_delta, qs, nu, zv,
           |              2.0 * (EXP(-ABS(zv)*ABS(zv)/2.0) / SQRT(2.0*PI())
           |                * (0.319381530 * (1.0/(1.0+0.2316419*ABS(zv)))
           |                   - 0.356563782 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 2)
           |                   + 1.781477937 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 3)
           |                   - 1.821255978 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 4)
           |                   + 1.330274429 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 5)))
           |                AS ptwo
           |       FROM z)
           |SELECT CAST(k AS BIGINT) AS k, ROUND(pooled_delta, 6) AS pooled_delta,
           |       ROUND(qs, 6) AS q_stat, CAST(k - 1 AS BIGINT) AS dof,
           |       ROUND(CASE WHEN zv >= 0 THEN ptwo/2.0 ELSE 1.0 - ptwo/2.0 END, 6)
           |         AS p_homogeneity,
           |       ROUND(CASE WHEN qs > 0 THEN GREATEST(0.0, (qs - nu)/qs)
           |                  ELSE 0.0 END, 6) AS i2,
           |       (CASE WHEN zv >= 0 THEN ptwo/2.0 ELSE 1.0 - ptwo/2.0 END) < 0.05
           |         AS heterogeneous
           |FROM pp""".stripMargin))

  /** Q370 — always-valid p for a CONTINUOUS metric
    * ([[graft.ops.SequentialTest.meanMonitor]] +
    * [[graft.ops.SequentialTest.alwaysValidPMean]]): q342's mixture SPRT
    * with the mean difference in Δ's seat and the Welch variance (from
    * cumulative moments) in V's — the revenue/engagement dashboard's
    * honest readout, where q342 serves conversion rates. Per-user total
    * activity observed at entry day; τ = 0.5 events (the mixture scale
    * lives on the metric's units — conversion's 0.1 default would be
    * wrong here, so the API requires it). The oracle replays the whole
    * grid: daily moment aggregation, per-arm cumulative windows, the
    * sample-variance fold, ln Λ, and the running-max p — a drifted
    * variance denominator (population vs sample), a mean computed before
    * the qualifying cut, or a τ² slip all hash-fail. */
  val q370 = QueryDef(
    "q370_always_valid_mean",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val activity = ev.groupBy("user_id")
        .agg(count(lit(1)).cast("double").as("v"))
      val subjects = entry.join(activity, "user_id")
        .select(
          (conv(
            substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
              1, 4), 16, 10).cast("int") % 2).cast("string").as("arm"),
          to_date(timestamp_micros(col("entry_us"))).as("entry_day"),
          col("v"))
      val looks = Tables.events(s, d).select(to_date(col("ts")).as("day")).distinct()
      val monitor = graft.ops.SequentialTest.meanMonitor(
        subjects, "arm", "entry_day", "v", looks, "day", focal = "1",
        minPerArm = 5L)
      graft.ops.SequentialTest.alwaysValidPMean(monitor, tau = 0.5)
        .select(
          col("day").cast("string").as("day"), col("k"),
          col("n_a"), r6(col("sum_a")).as("sum_a"),
          col("n_b"), r6(col("sum_b")).as("sum_b"),
          (r6(col("mean_a") - col("mean_b")) + lit(0.0)).as("delta"),
          (r6(col("log_lambda")) + lit(0.0)).as("log_lambda"),
          r6(col("p_always_valid")).as("p_always_valid"))
        .orderBy("day")
    },
    Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
           |                  epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |act AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS v FROM e GROUP BY 1),
           |s AS (SELECT CAST(CAST(('0x' || substr(md5('ab-v1:' ||
           |               CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 2
           |             AS VARCHAR) AS arm,
           |             CAST(make_timestamp(entry_us) AS DATE) AS day, v
           |      FROM en JOIN act USING (user_id)),
           |looks AS (SELECT DISTINCT day FROM e),
           |daily AS (SELECT arm, day, COUNT(*) AS en, SUM(v) AS sv,
           |                 SUM(v*v) AS svv FROM s GROUP BY 1,2),
           |arms AS (SELECT DISTINCT arm FROM s),
           |grid AS (SELECT a.arm, l.day, COALESCE(en,0) AS en,
           |                COALESCE(sv,0.0) AS sv, COALESCE(svv,0.0) AS svv
           |         FROM looks l CROSS JOIN arms a
           |         LEFT JOIN daily d ON d.arm=a.arm AND d.day=l.day),
           |cum AS (SELECT arm, day,
           |               CAST(SUM(en) OVER w AS BIGINT) AS n,
           |               CAST(SUM(sv) OVER w AS DOUBLE) AS sm,
           |               CAST(SUM(svv) OVER w AS DOUBLE) AS ssq
           |        FROM grid WINDOW w AS (PARTITION BY arm ORDER BY day)),
           |j AS (SELECT a.day, a.n AS n_a, a.sm AS sum_a, a.ssq AS ssq_a,
           |             b.n AS n_b, b.sm AS sum_b, b.ssq AS ssq_b
           |      FROM cum a JOIN cum b ON a.day = b.day AND a.arm='1' AND b.arm='0'
           |      WHERE a.n >= 5 AND b.n >= 5),
           |q AS (SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS k,
           |             n_a, sum_a, ssq_a, n_b, sum_b, ssq_b,
           |             sum_a/n_a AS ma, sum_b/n_b AS mb,
           |             ((ssq_a - sum_a*sum_a/n_a)/(n_a-1.0))/n_a
           |               + ((ssq_b - sum_b*sum_b/n_b)/(n_b-1.0))/n_b AS vv,
           |             0.25 AS t2
           |      FROM j),
           |ll AS (SELECT *,
           |              CASE WHEN vv > 0.0
           |                   THEN 0.5*LN(vv/(vv+t2))
           |                        + (ma-mb)*(ma-mb)*t2/(2.0*vv*(vv+t2))
           |                   ELSE 0.0 END AS log_lambda
           |       FROM q),
           |p AS (SELECT *,
           |             LEAST(1.0, EXP(-MAX(log_lambda) OVER (ORDER BY day
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
           |               AS pav
           |      FROM ll)
           |SELECT CAST(day AS VARCHAR) AS day, k, n_a,
           |       ROUND(sum_a, 6) AS sum_a, n_b, ROUND(sum_b, 6) AS sum_b,
           |       ROUND(ma - mb, 6) + 0 AS delta,
           |       ROUND(log_lambda, 6) + 0 AS log_lambda,
           |       ROUND(pav, 6) AS p_always_valid
           |FROM p ORDER BY day""".stripMargin))

  /** Q372 — A/B/n readout with FDR control ([[graft.ops.MultiArm
    * .report]]): four hash arms over the event subjects, arm 0 the
    * control, 7-day conversion as the metric — every treatment arm's
    * vs-control lift with its Welch z, two-sided p (A&S 7.1.26), and
    * the Benjamini-Hochberg q-value across the 3 comparisons. The
    * two-arm operators REFUSE this shape by design; this is its honest
    * home, and shipping raw per-arm p on an A/B/C/D is the multiplicity
    * mistake it prevents. The oracle replays moments → Welch → the
    * polynomial → the BH tail-min, so a mis-ranked q, a population
    * (n not n−1) variance, or an uncapped q all hash-fail. */
  val q372 = QueryDef(
    "q372_multi_arm_fdr",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.join(entry, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .select(
          (conv(
            substring(md5(concat(lit("abn-v1:"), col("user_id").cast("string"))),
              1, 4), 16, 10).cast("int") % 4).cast("string").as("arm"),
          ((col("conv_us").isNotNull) &&
            (col("conv_us") - col("entry_us")) < lit(7L * 86400000000L))
            .cast("int").as("conv"))
      graft.ops.MultiArm.report(subjects, "arm", "conv", control = "0")
        .select(
          col("arm"), col("n"),
          r6(col("mean")).as("mean"),
          (r6(col("delta")) + lit(0.0)).as("delta"),
          r6(col("se")).as("se"),
          (r4(col("z")) + lit(0.0)).as("z"),
          r6(col("p")).as("p"),
          col("k"),
          r6(col("q_bh")).as("q_bh"),
          col("discovery"))
        .orderBy("arm")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |s AS (SELECT CAST(CAST(('0x' || substr(md5('abn-v1:' ||
           |               CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 4
           |             AS VARCHAR) AS arm,
           |             CASE WHEN conv_us IS NOT NULL
           |                    AND conv_us - entry_us < 604800000000 THEN 1.0
           |                  ELSE 0.0 END AS y
           |      FROM en LEFT JOIN cv USING (user_id)),
           |g AS (SELECT arm, COUNT(*) AS n, SUM(y) AS sm, SUM(y*y) AS ss
           |      FROM s GROUP BY 1),
           |c AS (SELECT CAST(n AS DOUBLE) AS n_c, sm AS s_c, ss AS ss_c
           |      FROM g WHERE arm = '0'),
           |t AS (SELECT arm, n, sm, ss, n_c, s_c, ss_c FROM g CROSS JOIN c
           |      WHERE arm <> '0'),
           |w AS (SELECT arm, n,
           |             sm / n AS mean,
           |             sm / n - s_c / n_c AS delta,
           |             SQRT(((ss - sm*sm/n) / (n - 1.0)) / n
           |                  + ((ss_c - s_c*s_c/n_c) / (n_c - 1.0)) / n_c) AS se
           |      FROM t),
           |z AS (SELECT *, CASE WHEN se > 0 THEN delta / se ELSE 0.0 END AS zv
           |      FROM w),
           |p AS (SELECT *,
           |             2.0 * (EXP(-ABS(zv)*ABS(zv)/2.0) / SQRT(2.0*PI())
           |               * (0.319381530 * (1.0/(1.0+0.2316419*ABS(zv)))
           |                  - 0.356563782 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 2)
           |                  + 1.781477937 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 3)
           |                  - 1.821255978 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 4)
           |                  + 1.330274429 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 5)))
           |               AS pv
           |      FROM z),
           |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pv, arm) AS k,
           |              COUNT(*) OVER () AS m
           |       FROM p),
           |q AS (SELECT *,
           |             LEAST(1.0, MIN(pv * m / k) OVER (ORDER BY pv, arm
           |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS qbh
           |      FROM rk)
           |SELECT arm, n, ROUND(mean, 6) AS mean,
           |       ROUND(delta, 6) + 0 AS delta, ROUND(se, 6) AS se,
           |       ROUND(zv, 4) + 0 AS z, ROUND(pv, 6) AS p,
           |       k, ROUND(qbh, 6) AS q_bh, qbh <= 0.05 AS discovery
           |FROM q ORDER BY arm""".stripMargin))

  /** Q373 — CUPED-adjusted A/B/n ([[graft.ops.MultiArm.report]] with
    * `xCol`): q372's four hash arms, each vs-control contrast adjusted
    * with the PAIR-POOLED θ over strictly pre-entry activity — the
    * variance-reduced multiplicity-controlled readout (BH ranks the
    * ADJUSTED p). The oracle replays per-arm moments → pair θ →
    * adjusted Welch → the polynomial → the BH tail-min, so a θ pooled
    * over the wrong arms (all four instead of the pair), a
    * post-treatment covariate window, or a BH ranked on the raw p all
    * hash-fail. */
  val q373 = QueryDef(
    "q373_multi_arm_cuped",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.join(entry, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val preAct = ev.join(entry, "user_id")
        .filter(col("us") < col("entry_us"))
        .groupBy("user_id").agg(count(lit(1)).as("pre_n"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .join(preAct, Seq("user_id"), "left")
        .select(
          (conv(
            substring(md5(concat(lit("abn-v1:"), col("user_id").cast("string"))),
              1, 4), 16, 10).cast("int") % 4).cast("string").as("arm"),
          ((col("conv_us").isNotNull) &&
            (col("conv_us") - col("entry_us")) < lit(7L * 86400000000L))
            .cast("int").as("conv"),
          coalesce(col("pre_n"), lit(0L)).cast("double").as("pre_x"))
      graft.ops.MultiArm.report(subjects, "arm", "conv", control = "0",
          xCol = Some("pre_x"))
        .select(
          col("arm"), col("n"),
          (r6(col("theta")) + lit(0.0)).as("theta"),
          (r6(col("delta")) + lit(0.0)).as("delta"),
          (r6(col("delta_cuped")) + lit(0.0)).as("delta_cuped"),
          r6(col("se_cuped")).as("se_cuped"),
          (r4(col("z_cuped")) + lit(0.0)).as("z_cuped"),
          r6(col("p_cuped")).as("p_cuped"),
          col("k"),
          r6(col("q_bh")).as("q_bh"),
          col("discovery"))
        .orderBy("arm")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |pa AS (SELECT e.user_id, COUNT(*) AS pre_n FROM e JOIN en USING (user_id)
           |       WHERE us < entry_us GROUP BY 1),
           |s AS (SELECT CAST(CAST(('0x' || substr(md5('abn-v1:' ||
           |               CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 4
           |             AS VARCHAR) AS arm,
           |             CASE WHEN conv_us IS NOT NULL
           |                    AND conv_us - entry_us < 604800000000 THEN 1.0
           |                  ELSE 0.0 END AS y,
           |             CAST(COALESCE(pre_n, 0) AS DOUBLE) AS x
           |      FROM en LEFT JOIN cv USING (user_id) LEFT JOIN pa USING (user_id)),
           |g AS (SELECT arm, COUNT(*) AS n, SUM(y) AS sm, SUM(y*y) AS ss,
           |             SUM(x) AS sx, SUM(x*x) AS sxx, SUM(x*y) AS sxy
           |      FROM s GROUP BY 1),
           |c AS (SELECT CAST(n AS DOUBLE) AS n_c, sm AS s_c, ss AS ss_c,
           |             sx AS sx_c, sxx AS sxx_c, sxy AS sxy_c
           |      FROM g WHERE arm = '0'),
           |t AS (SELECT arm, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS n_t,
           |             sm, ss, sx, sxx, sxy, n_c, s_c, ss_c, sx_c, sxx_c, sxy_c
           |      FROM g CROSS JOIN c WHERE arm <> '0'),
           |th AS (SELECT *,
           |              n_t + n_c AS nn,
           |              sx + sx_c AS sxp, sm + s_c AS syp,
           |              sxx + sxx_c AS sxxp, sxy + sxy_c AS sxyp
           |       FROM t),
           |th2 AS (SELECT *,
           |               CASE WHEN sxxp - sxp*sxp/nn > 0
           |                    THEN (sxyp - sxp*syp/nn) / (sxxp - sxp*sxp/nn)
           |                    ELSE 0.0 END AS theta
           |        FROM th),
           |w AS (SELECT *,
           |             sm/n_t - s_c/n_c AS delta,
           |             (sm/n_t - theta*(sx/n_t - sxp/nn))
           |               - (s_c/n_c - theta*(sx_c/n_c - sxp/nn)) AS delta_c,
           |             SQRT((((ss - sm*sm/n_t)/(n_t-1.0))
           |                   - 2.0*theta*((sxy - sx*sm/n_t)/(n_t-1.0))
           |                   + theta*theta*((sxx - sx*sx/n_t)/(n_t-1.0))) / n_t
           |                  + (((ss_c - s_c*s_c/n_c)/(n_c-1.0))
           |                     - 2.0*theta*((sxy_c - sx_c*s_c/n_c)/(n_c-1.0))
           |                     + theta*theta*((sxx_c - sx_c*sx_c/n_c)/(n_c-1.0)))
           |                    / n_c) AS se_c
           |      FROM th2),
           |z AS (SELECT *, CASE WHEN se_c > 0 THEN delta_c / se_c ELSE 0.0 END AS zv
           |      FROM w),
           |p AS (SELECT *,
           |             2.0 * (EXP(-ABS(zv)*ABS(zv)/2.0) / SQRT(2.0*PI())
           |               * (0.319381530 * (1.0/(1.0+0.2316419*ABS(zv)))
           |                  - 0.356563782 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 2)
           |                  + 1.781477937 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 3)
           |                  - 1.821255978 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 4)
           |                  + 1.330274429 * POWER(1.0/(1.0+0.2316419*ABS(zv)), 5)))
           |               AS pv
           |      FROM z),
           |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pv, arm) AS k,
           |              COUNT(*) OVER () AS m
           |       FROM p),
           |q AS (SELECT *,
           |             LEAST(1.0, MIN(pv * m / k) OVER (ORDER BY pv, arm
           |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS qbh
           |      FROM rk)
           |SELECT arm, n, ROUND(theta, 6) + 0 AS theta,
           |       ROUND(delta, 6) + 0 AS delta,
           |       ROUND(delta_c, 6) + 0 AS delta_cuped,
           |       ROUND(se_c, 6) AS se_cuped,
           |       ROUND(zv, 4) + 0 AS z_cuped, ROUND(pv, 6) AS p_cuped,
           |       k, ROUND(qbh, 6) AS q_bh, qbh <= 0.05 AS discovery
           |FROM q ORDER BY arm""".stripMargin))

  /** Q374 — ALWAYS-VALID A/B/n ([[graft.ops.MultiArm.sequential]]):
    * q372's four hash arms monitored CONTINUOUSLY — per-contrast
    * normal-mean mixture SPRT over cumulative moments (q370's
    * arithmetic, per arm) + Benjamini-Hochberg per look over the
    * always-valid p's (e-BH: FDR-valid under optional stopping). The
    * fixed-horizon q372 readout is only honest at the planned horizon;
    * this is the one a dashboard may poll. The oracle replays the whole
    * per-(look, arm) grid — daily moments, per-arm cumulative windows,
    * the qualifying cut, lnΛ, per-arm running max, and the per-day BH
    * tail-min — so a θ²/τ² slip, a BH ranked on the raw z, or a running
    * max that leaks across arms all hash-fail. */
  val q374 = QueryDef(
    "q374_multi_arm_sequential",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val activity = ev.groupBy("user_id")
        .agg(count(lit(1)).cast("double").as("v"))
      val subjects = entry.join(activity, "user_id")
        .select(
          (conv(
            substring(md5(concat(lit("abn-v1:"), col("user_id").cast("string"))),
              1, 4), 16, 10).cast("int") % 4).cast("string").as("arm"),
          to_date(timestamp_micros(col("entry_us"))).as("entry_day"),
          col("v"))
      val looks = Tables.events(s, d).select(to_date(col("ts")).as("day")).distinct()
      graft.ops.MultiArm.sequential(
        subjects, "arm", "entry_day", "v", looks, "day", control = "0",
        tau = 0.5, fdr = 0.05, minPerArm = 2L)
        .select(
          col("day").cast("string").as("day"), col("arm"), col("k"),
          col("n"), r6(col("mean")).as("mean"),
          (r6(col("delta")) + lit(0.0)).as("delta"),
          (r6(col("log_lambda")) + lit(0.0)).as("log_lambda"),
          r6(col("p_always_valid")).as("p_always_valid"),
          col("m"), col("rk"), r6(col("q_bh")).as("q_bh"), col("discovery"))
        .orderBy("day", "arm")
    },
    Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
           |                  epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |act AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS v FROM e GROUP BY 1),
           |s AS (SELECT CAST(CAST(('0x' || substr(md5('abn-v1:' ||
           |               CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 4
           |             AS VARCHAR) AS arm,
           |             CAST(make_timestamp(entry_us) AS DATE) AS day, v
           |      FROM en JOIN act USING (user_id)),
           |looks AS (SELECT DISTINCT day FROM e),
           |daily AS (SELECT arm, day, COUNT(*) AS en, SUM(v) AS sv,
           |                 SUM(v*v) AS svv FROM s GROUP BY 1,2),
           |arms AS (SELECT DISTINCT arm FROM s),
           |grid AS (SELECT a.arm, l.day, COALESCE(en,0) AS en,
           |                COALESCE(sv,0.0) AS sv, COALESCE(svv,0.0) AS svv
           |         FROM looks l CROSS JOIN arms a
           |         LEFT JOIN daily d ON d.arm=a.arm AND d.day=l.day),
           |cum AS (SELECT arm, day,
           |               CAST(SUM(en) OVER w AS BIGINT) AS n,
           |               CAST(SUM(sv) OVER w AS DOUBLE) AS sm,
           |               CAST(SUM(svv) OVER w AS DOUBLE) AS ssq
           |        FROM grid WINDOW w AS (PARTITION BY arm ORDER BY day)),
           |c AS (SELECT day, n AS n_c, sm AS s_c, ssq AS ss_c
           |      FROM cum WHERE arm='0'),
           |j AS (SELECT t.arm, t.day, t.n, t.sm, t.ssq, c.n_c, c.s_c, c.ss_c
           |      FROM cum t JOIN c USING (day)
           |      WHERE t.arm <> '0' AND t.n >= 2 AND c.n_c >= 2),
           |q AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY arm ORDER BY day) AS k,
           |             sm/n AS ma, s_c/n_c AS mc,
           |             ((ssq - sm*sm/n)/(n-1.0))/n
           |               + ((ss_c - s_c*s_c/n_c)/(n_c-1.0))/n_c AS vv,
           |             0.25 AS t2
           |      FROM j),
           |ll AS (SELECT *,
           |              CASE WHEN vv > 0.0
           |                   THEN 0.5*LN(vv/(vv+t2))
           |                        + (ma-mc)*(ma-mc)*t2/(2.0*vv*(vv+t2))
           |                   ELSE 0.0 END AS log_lambda
           |       FROM q),
           |p AS (SELECT *,
           |             LEAST(1.0, EXP(-MAX(log_lambda) OVER (PARTITION BY arm
           |               ORDER BY day
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
           |               AS pav
           |      FROM ll),
           |rk AS (SELECT *, COUNT(*) OVER (PARTITION BY day) AS m,
           |              ROW_NUMBER() OVER (PARTITION BY day ORDER BY pav, arm) AS rk
           |       FROM p),
           |q2 AS (SELECT *,
           |              LEAST(1.0, MIN(pav * m / rk) OVER (PARTITION BY day
           |                ORDER BY pav, arm
           |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS qbh
           |       FROM rk)
           |SELECT CAST(day AS VARCHAR) AS day, arm, k, n,
           |       ROUND(ma, 6) AS mean, ROUND(ma - mc, 6) + 0 AS delta,
           |       ROUND(log_lambda, 6) + 0 AS log_lambda,
           |       ROUND(pav, 6) AS p_always_valid,
           |       CAST(m AS BIGINT) AS m, rk,
           |       ROUND(qbh, 6) AS q_bh, qbh <= 0.05 AS discovery
           |FROM q2 ORDER BY day, arm""".stripMargin))

  /** Q375 — CUPED-adjusted always-valid A/B/n ([[graft.ops.MultiArm
    * .sequential]] with `xCol`): q374's monitor with q373's pair-pooled
    * θ evaluated on the CUMULATIVE pair moments at every look (the
    * running-θ policy the streaming scorecard fold uses), the mixture
    * SPRT over the adjusted lift with its Welch variance, and BH per
    * look over the ADJUSTED always-valid p. Metric: 7-day conversion;
    * covariate: strictly pre-entry activity; τ = 0.1 (the adjusted lift
    * is a conversion-rate difference). The oracle replays θ → adjusted
    * Δ/V → lnΛ → running max → BH per day, so a θ pooled over all four
    * arms, a post-treatment covariate, or BH over the raw p hash-fail. */
  val q375 = QueryDef(
    "q375_multi_arm_seq_cuped",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.join(entry, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val preAct = ev.join(entry, "user_id")
        .filter(col("us") < col("entry_us"))
        .groupBy("user_id").agg(count(lit(1)).as("pre_n"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .join(preAct, Seq("user_id"), "left")
        .select(
          (conv(
            substring(md5(concat(lit("abn-v1:"), col("user_id").cast("string"))),
              1, 4), 16, 10).cast("int") % 4).cast("string").as("arm"),
          to_date(timestamp_micros(col("entry_us"))).as("entry_day"),
          ((col("conv_us").isNotNull) &&
            (col("conv_us") - col("entry_us")) < lit(7L * 86400000000L))
            .cast("double").as("conv"),
          coalesce(col("pre_n"), lit(0L)).cast("double").as("pre_x"))
      val looks = Tables.events(s, d).select(to_date(col("ts")).as("day")).distinct()
      graft.ops.MultiArm.sequential(
        subjects, "arm", "entry_day", "conv", looks, "day", control = "0",
        tau = 0.1, fdr = 0.05, minPerArm = 2L, xCol = Some("pre_x"))
        .select(
          col("day").cast("string").as("day"), col("arm"), col("k"), col("n"),
          (r6(col("theta")) + lit(0.0)).as("theta"),
          (r6(col("delta")) + lit(0.0)).as("delta"),
          (r6(col("delta_cuped")) + lit(0.0)).as("delta_cuped"),
          r6(col("se_cuped")).as("se_cuped"),
          (r6(col("log_lambda_cuped")) + lit(0.0)).as("log_lambda_cuped"),
          r6(col("p_always_valid_cuped")).as("p_always_valid_cuped"),
          col("rk"), r6(col("q_bh")).as("q_bh"), col("discovery"))
        .orderBy("day", "arm")
    },
    Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
           |                  epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |pa AS (SELECT e.user_id, COUNT(*) AS pre_n FROM e JOIN en USING (user_id)
           |       WHERE us < entry_us GROUP BY 1),
           |s AS (SELECT CAST(CAST(('0x' || substr(md5('abn-v1:' ||
           |               CAST(en.user_id AS VARCHAR)),1,4)) AS INTEGER) % 4
           |             AS VARCHAR) AS arm,
           |             CAST(make_timestamp(entry_us) AS DATE) AS day,
           |             CASE WHEN conv_us IS NOT NULL
           |                    AND conv_us - entry_us < 604800000000 THEN 1.0
           |                  ELSE 0.0 END AS y,
           |             CAST(COALESCE(pre_n, 0) AS DOUBLE) AS x
           |      FROM en LEFT JOIN cv USING (user_id) LEFT JOIN pa USING (user_id)),
           |looks AS (SELECT DISTINCT day FROM e),
           |daily AS (SELECT arm, day, COUNT(*) AS en, SUM(y) AS sv, SUM(y*y) AS svv,
           |                 SUM(x) AS svx, SUM(x*x) AS svxx, SUM(x*y) AS svxy
           |          FROM s GROUP BY 1,2),
           |arms AS (SELECT DISTINCT arm FROM s),
           |grid AS (SELECT a.arm, l.day, COALESCE(en,0) AS en,
           |                COALESCE(sv,0.0) AS sv, COALESCE(svv,0.0) AS svv,
           |                COALESCE(svx,0.0) AS svx, COALESCE(svxx,0.0) AS svxx,
           |                COALESCE(svxy,0.0) AS svxy
           |         FROM looks l CROSS JOIN arms a
           |         LEFT JOIN daily d ON d.arm=a.arm AND d.day=l.day),
           |cum AS (SELECT arm, day,
           |               CAST(SUM(en) OVER w AS BIGINT) AS n,
           |               CAST(SUM(sv) OVER w AS DOUBLE) AS sm,
           |               CAST(SUM(svv) OVER w AS DOUBLE) AS ssq,
           |               CAST(SUM(svx) OVER w AS DOUBLE) AS sx,
           |               CAST(SUM(svxx) OVER w AS DOUBLE) AS sxx,
           |               CAST(SUM(svxy) OVER w AS DOUBLE) AS sxy
           |        FROM grid WINDOW w AS (PARTITION BY arm ORDER BY day)),
           |c AS (SELECT day, n AS n_c, sm AS s_c, ssq AS ss_c,
           |             sx AS sx_c, sxx AS sxx_c, sxy AS sxy_c
           |      FROM cum WHERE arm='0'),
           |j AS (SELECT t.arm, t.day, t.n, t.sm, t.ssq, t.sx, t.sxx, t.sxy,
           |             c.n_c, c.s_c, c.ss_c, c.sx_c, c.sxx_c, c.sxy_c,
           |             CAST(t.n AS DOUBLE) AS nt, CAST(c.n_c AS DOUBLE) AS nc
           |      FROM cum t JOIN c USING (day)
           |      WHERE t.arm <> '0' AND t.n >= 2 AND c.n_c >= 2),
           |th AS (SELECT *, nt + nc AS nn, sx + sx_c AS sxp, sm + s_c AS syp,
           |              sxx + sxx_c AS sxxp, sxy + sxy_c AS sxyp,
           |              ROW_NUMBER() OVER (PARTITION BY arm ORDER BY day) AS k
           |       FROM j),
           |th2 AS (SELECT *,
           |               CASE WHEN sxxp - sxp*sxp/nn > 0
           |                    THEN (sxyp - sxp*syp/nn) / (sxxp - sxp*sxp/nn)
           |                    ELSE 0.0 END AS theta
           |        FROM th),
           |w AS (SELECT *,
           |             sm/nt - s_c/nc AS delta,
           |             (sm/nt - theta*(sx/nt - sxp/nn))
           |               - (s_c/nc - theta*(sx_c/nc - sxp/nn)) AS delta_c,
           |             (((ssq - sm*sm/nt)/(nt-1.0))
           |               - 2.0*theta*((sxy - sx*sm/nt)/(nt-1.0))
           |               + theta*theta*((sxx - sx*sx/nt)/(nt-1.0))) / nt
           |              + (((ss_c - s_c*s_c/nc)/(nc-1.0))
           |                 - 2.0*theta*((sxy_c - sx_c*s_c/nc)/(nc-1.0))
           |                 + theta*theta*((sxx_c - sx_c*sx_c/nc)/(nc-1.0))) / nc
           |               AS vc
           |      FROM th2),
           |ll AS (SELECT *,
           |              CASE WHEN vc > 0.0
           |                   THEN 0.5*LN(vc/(vc+0.1*0.1))
           |                        + delta_c*delta_c*(0.1*0.1)/(2.0*vc*(vc+0.1*0.1))
           |                   ELSE 0.0 END AS lnl
           |       FROM w),
           |p AS (SELECT *,
           |             LEAST(1.0, EXP(-MAX(lnl) OVER (PARTITION BY arm
           |               ORDER BY day
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
           |               AS pav
           |      FROM ll),
           |rk AS (SELECT *, COUNT(*) OVER (PARTITION BY day) AS m,
           |              ROW_NUMBER() OVER (PARTITION BY day ORDER BY pav, arm) AS rk
           |       FROM p),
           |q2 AS (SELECT *,
           |              LEAST(1.0, MIN(pav * m / rk) OVER (PARTITION BY day
           |                ORDER BY pav, arm
           |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS qbh
           |       FROM rk)
           |SELECT CAST(day AS VARCHAR) AS day, arm, k, n,
           |       ROUND(theta, 6) + 0 AS theta,
           |       ROUND(delta, 6) + 0 AS delta,
           |       ROUND(delta_c, 6) + 0 AS delta_cuped,
           |       ROUND(CASE WHEN vc > 0.0 THEN SQRT(vc) ELSE 0.0 END, 6)
           |         AS se_cuped,
           |       ROUND(lnl, 6) + 0 AS log_lambda_cuped,
           |       ROUND(pav, 6) AS p_always_valid_cuped,
           |       rk, ROUND(qbh, 6) AS q_bh, qbh <= 0.05 AS discovery
           |FROM q2 ORDER BY day, arm""".stripMargin))

  /** Q377 — CLUSTER-level CUPED sequential monitoring
    * ([[graft.ops.SequentialTest.clusterMeanMonitor]] with `xCol` +
    * [[graft.ops.SequentialTest.alwaysValidPMeanCuped]]): geo-randomized
    * arms (hash of `user_id % 53`), 7-day conversion, strictly
    * pre-entry activity as the covariate — the unit of analysis is the
    * CLUSTER MEAN, the θ is pair-pooled over the cumulative cluster
    * moments at every look, and the mixture SPRT runs on the adjusted
    * cluster-mean lift with its cluster-level Welch variance. The
    * oracle replays the full lattice: per-(cluster, day) conditional
    * sums → per-cluster cumulative windows → cluster means → per-day
    * moments across pure clusters → θ → adjusted Δ/V → ln Λ → running
    * max — so an iid variance slipped in for the cluster one, a θ
    * pooled at subject level, or a mixed-cluster leak all hash-fail. */
  val q377 = QueryDef(
    "q377_cluster_seq_cuped",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.join(entry, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val preAct = ev.join(entry, "user_id")
        .filter(col("us") < col("entry_us"))
        .groupBy("user_id").agg(count(lit(1)).as("pre_n"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .join(preAct, Seq("user_id"), "left")
        .select(
          (col("user_id") % 53).cast("string").as("geo"),
          (conv(
            substring(md5(concat(lit("geo-v1:"),
              (col("user_id") % 53).cast("string"))), 1, 4), 16, 10)
            .cast("int") % 2).cast("string").as("arm"),
          to_date(timestamp_micros(col("entry_us"))).as("entry_day"),
          ((col("conv_us").isNotNull) &&
            (col("conv_us") - col("entry_us")) < lit(7L * 86400000000L))
            .cast("double").as("conv"),
          coalesce(col("pre_n"), lit(0L)).cast("double").as("pre_x"))
      val looks = Tables.events(s, d).select(to_date(col("ts")).as("day")).distinct()
      val monitor = graft.ops.SequentialTest.clusterMeanMonitor(
        subjects, "arm", "entry_day", "conv", "geo", looks, "day",
        focal = "1", control = "0", minClusters = 2L, xCol = Some("pre_x"))
      graft.ops.SequentialTest.alwaysValidPMeanCuped(monitor, tau = 0.1)
        .select(
          col("day").cast("string").as("day"), col("k"),
          col("n_a"), col("n_b"), col("mixed_m"),
          (r6(col("theta")) + lit(0.0)).as("theta"),
          (r6(col("delta_cuped")) + lit(0.0)).as("delta_cuped"),
          r6(col("se_cuped")).as("se_cuped"),
          (r6(col("log_lambda_cuped")) + lit(0.0)).as("log_lambda_cuped"),
          r6(col("p_always_valid_cuped")).as("p_always_valid_cuped"))
        .orderBy("day")
    },
    Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
           |                  epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |pa AS (SELECT e.user_id, COUNT(*) AS pre_n FROM e JOIN en USING (user_id)
           |       WHERE us < entry_us GROUP BY 1),
           |s AS (SELECT CAST(en.user_id % 53 AS VARCHAR) AS geo,
           |             CAST(CAST(('0x' || substr(md5('geo-v1:' ||
           |               CAST(en.user_id % 53 AS VARCHAR)),1,4)) AS INTEGER) % 2
           |             AS VARCHAR) AS arm,
           |             CAST(make_timestamp(entry_us) AS DATE) AS day,
           |             CASE WHEN conv_us IS NOT NULL
           |                    AND conv_us - entry_us < 604800000000 THEN 1.0
           |                  ELSE 0.0 END AS y,
           |             CAST(COALESCE(pre_n, 0) AS DOUBLE) AS x
           |      FROM en LEFT JOIN cv USING (user_id) LEFT JOIN pa USING (user_id)),
           |looks AS (SELECT DISTINCT day FROM e),
           |daily AS (SELECT geo, day,
           |                 SUM(CASE WHEN arm='1' THEN 1 ELSE 0 END) AS dn_f,
           |                 SUM(CASE WHEN arm='1' THEN y ELSE 0.0 END) AS dsy_f,
           |                 SUM(CASE WHEN arm='0' THEN 1 ELSE 0 END) AS dn_c,
           |                 SUM(CASE WHEN arm='0' THEN y ELSE 0.0 END) AS dsy_c,
           |                 SUM(CASE WHEN arm='1' THEN x ELSE 0.0 END) AS dsx_f,
           |                 SUM(CASE WHEN arm='0' THEN x ELSE 0.0 END) AS dsx_c
           |          FROM s GROUP BY 1,2),
           |geos AS (SELECT DISTINCT geo FROM s),
           |grid AS (SELECT g.geo, l.day,
           |                COALESCE(dn_f,0) AS dn_f, COALESCE(dsy_f,0.0) AS dsy_f,
           |                COALESCE(dn_c,0) AS dn_c, COALESCE(dsy_c,0.0) AS dsy_c,
           |                COALESCE(dsx_f,0.0) AS dsx_f, COALESCE(dsx_c,0.0) AS dsx_c
           |         FROM looks l CROSS JOIN geos g
           |         LEFT JOIN daily d ON d.geo=g.geo AND d.day=l.day),
           |cum AS (SELECT geo, day,
           |               CAST(SUM(dn_f) OVER w AS BIGINT) AS n_f,
           |               CAST(SUM(dsy_f) OVER w AS DOUBLE) AS sy_f,
           |               CAST(SUM(dn_c) OVER w AS BIGINT) AS n_c,
           |               CAST(SUM(dsy_c) OVER w AS DOUBLE) AS sy_c,
           |               CAST(SUM(dsx_f) OVER w AS DOUBLE) AS sx_f,
           |               CAST(SUM(dsx_c) OVER w AS DOUBLE) AS sx_c
           |        FROM grid WINDOW w AS (PARTITION BY geo ORDER BY day)),
           |looksum AS (SELECT day,
           |              SUM(CASE WHEN n_f > 0 AND n_c = 0 THEN 1 ELSE 0 END) AS n_a,
           |              SUM(CASE WHEN n_f > 0 AND n_c = 0 THEN sy_f/n_f ELSE 0.0 END) AS sum_a,
           |              SUM(CASE WHEN n_f > 0 AND n_c = 0 THEN (sy_f/n_f)*(sy_f/n_f) ELSE 0.0 END) AS ssq_a,
           |              SUM(CASE WHEN n_f > 0 AND n_c = 0 THEN sx_f/n_f ELSE 0.0 END) AS sx_a,
           |              SUM(CASE WHEN n_f > 0 AND n_c = 0 THEN (sx_f/n_f)*(sx_f/n_f) ELSE 0.0 END) AS sxx_a,
           |              SUM(CASE WHEN n_f > 0 AND n_c = 0 THEN (sx_f/n_f)*(sy_f/n_f) ELSE 0.0 END) AS sxy_a,
           |              SUM(CASE WHEN n_c > 0 AND n_f = 0 THEN 1 ELSE 0 END) AS n_b,
           |              SUM(CASE WHEN n_c > 0 AND n_f = 0 THEN sy_c/n_c ELSE 0.0 END) AS sum_b,
           |              SUM(CASE WHEN n_c > 0 AND n_f = 0 THEN (sy_c/n_c)*(sy_c/n_c) ELSE 0.0 END) AS ssq_b,
           |              SUM(CASE WHEN n_c > 0 AND n_f = 0 THEN sx_c/n_c ELSE 0.0 END) AS sx_b,
           |              SUM(CASE WHEN n_c > 0 AND n_f = 0 THEN (sx_c/n_c)*(sx_c/n_c) ELSE 0.0 END) AS sxx_b,
           |              SUM(CASE WHEN n_c > 0 AND n_f = 0 THEN (sx_c/n_c)*(sy_c/n_c) ELSE 0.0 END) AS sxy_b,
           |              SUM(CASE WHEN n_f > 0 AND n_c > 0 THEN 1 ELSE 0 END) AS mixed_m
           |            FROM cum GROUP BY 1),
           |qual AS (SELECT *, ROW_NUMBER() OVER (ORDER BY day) AS k,
           |                CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb
           |         FROM looksum WHERE n_a >= 2 AND n_b >= 2),
           |th AS (SELECT *, na + nb AS nn, sx_a + sx_b AS sxp, sum_a + sum_b AS syp,
           |              sxx_a + sxx_b AS sxxp, sxy_a + sxy_b AS sxyp
           |       FROM qual),
           |th2 AS (SELECT *,
           |               CASE WHEN sxxp - sxp*sxp/nn > 0
           |                    THEN (sxyp - sxp*syp/nn) / (sxxp - sxp*sxp/nn)
           |                    ELSE 0.0 END AS theta
           |        FROM th),
           |w AS (SELECT *,
           |             (sum_a/na - theta*(sx_a/na - sxp/nn))
           |               - (sum_b/nb - theta*(sx_b/nb - sxp/nn)) AS delta_c,
           |             (((ssq_a - sum_a*sum_a/na)/(na-1.0))
           |               - 2.0*theta*((sxy_a - sx_a*sum_a/na)/(na-1.0))
           |               + theta*theta*((sxx_a - sx_a*sx_a/na)/(na-1.0))) / na
           |              + (((ssq_b - sum_b*sum_b/nb)/(nb-1.0))
           |                 - 2.0*theta*((sxy_b - sx_b*sum_b/nb)/(nb-1.0))
           |                 + theta*theta*((sxx_b - sx_b*sx_b/nb)/(nb-1.0))) / nb
           |               AS vc
           |      FROM th2),
           |ll AS (SELECT *,
           |              CASE WHEN vc > 0.0
           |                   THEN 0.5*LN(vc/(vc+0.1*0.1))
           |                        + delta_c*delta_c*(0.1*0.1)/(2.0*vc*(vc+0.1*0.1))
           |                   ELSE 0.0 END AS lnl
           |       FROM w),
           |p AS (SELECT *,
           |             LEAST(1.0, EXP(-MAX(lnl) OVER (ORDER BY day
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
           |               AS pav
           |      FROM ll)
           |SELECT CAST(day AS VARCHAR) AS day, k,
           |       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           |       CAST(mixed_m AS BIGINT) AS mixed_m,
           |       ROUND(theta, 6) + 0 AS theta,
           |       ROUND(delta_c, 6) + 0 AS delta_cuped,
           |       ROUND(CASE WHEN vc > 0.0 THEN SQRT(vc) ELSE 0.0 END, 6)
           |         AS se_cuped,
           |       ROUND(lnl, 6) + 0 AS log_lambda_cuped,
           |       ROUND(pav, 6) AS p_always_valid_cuped
           |FROM p ORDER BY day""".stripMargin))

  /** Q378 — CLUSTER-randomized A/B/n at fixed horizon
    * ([[graft.ops.MultiArm.reportClustered]]): four hash arms assigned
    * at the GEO level (`user_id % 53` clusters), so the unit of
    * analysis is the geo — each arm's sample is its geos' unweighted
    * cluster means, every Welch SE comes from the variance OF those
    * means, θ pools the pair's cluster-mean covariates, and BH ranks
    * the adjusted p. The oracle replays cluster means → per-arm
    * moments → pair θ → adjusted Welch → the A&S polynomial → the BH
    * tail-min, so an iid SE slipped in for the cluster one (the
    * classic cluster-randomization mistake), a subject-level θ, or a
    * BH over raw p all hash-fail. */
  val q378 = QueryDef(
    "q378_multi_arm_clustered",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.join(entry, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val preAct = ev.join(entry, "user_id")
        .filter(col("us") < col("entry_us"))
        .groupBy("user_id").agg(count(lit(1)).as("pre_n"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .join(preAct, Seq("user_id"), "left")
        .select(
          (col("user_id") % 53).cast("string").as("geo"),
          ((col("user_id") % 53) % 4).cast("string").as("arm"),
          ((col("conv_us").isNotNull) &&
            (col("conv_us") - col("entry_us")) < lit(7L * 86400000000L))
            .cast("double").as("conv"),
          coalesce(col("pre_n"), lit(0L)).cast("double").as("pre_x"))
      graft.ops.MultiArm.reportClustered(subjects, "arm", "conv", "geo",
          control = "0", xCol = Some("pre_x"))
        .select(
          col("arm"), col("n"),
          r6(col("mean")).as("mean"),
          (r6(col("delta")) + lit(0.0)).as("delta"),
          r6(col("se")).as("se"),
          (r6(col("theta")) + lit(0.0)).as("theta"),
          (r6(col("delta_cuped")) + lit(0.0)).as("delta_cuped"),
          r6(col("se_cuped")).as("se_cuped"),
          (r4(col("z_cuped")) + lit(0.0)).as("z_cuped"),
          r6(col("p_cuped")).as("p_cuped"),
          col("k"), r6(col("q_bh")).as("q_bh"), col("discovery"),
          col("mixed_m"))
        .orderBy("arm")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |pa AS (SELECT e.user_id, COUNT(*) AS pre_n FROM e JOIN en USING (user_id)
           |       WHERE us < entry_us GROUP BY 1),
           |s AS (SELECT CAST(en.user_id % 53 AS VARCHAR) AS geo,
           |             CAST((en.user_id % 53) % 4 AS VARCHAR) AS arm,
           |             CASE WHEN conv_us IS NOT NULL
           |                    AND conv_us - entry_us < 604800000000 THEN 1.0
           |                  ELSE 0.0 END AS y,
           |             CAST(COALESCE(pre_n, 0) AS DOUBLE) AS x
           |      FROM en LEFT JOIN cv USING (user_id) LEFT JOIN pa USING (user_id)),
           |cl AS (SELECT geo, MIN(arm) AS arm, COUNT(*) AS cn,
           |              SUM(y) AS csy, SUM(x) AS csx FROM s GROUP BY 1),
           |cm AS (SELECT arm, csy/cn AS my, csx/cn AS mx FROM cl),
           |g AS (SELECT arm, COUNT(*) AS n, SUM(my) AS sm, SUM(my*my) AS ss,
           |             SUM(mx) AS sx, SUM(mx*mx) AS sxx, SUM(mx*my) AS sxy
           |      FROM cm GROUP BY 1),
           |c AS (SELECT CAST(n AS DOUBLE) AS nc, sm AS s_c, ss AS ss_c,
           |             sx AS sx_c, sxx AS sxx_c, sxy AS sxy_c
           |      FROM g WHERE arm = '0'),
           |t AS (SELECT arm, n, CAST(n AS DOUBLE) AS nt, sm, ss, sx, sxx, sxy,
           |             nc, s_c, ss_c, sx_c, sxx_c, sxy_c
           |      FROM g CROSS JOIN c WHERE arm <> '0'),
           |th AS (SELECT *, nt + nc AS nn, sx + sx_c AS sxp, sm + s_c AS syp
           |       FROM t),
           |th2 AS (SELECT *,
           |               CASE WHEN (sxx + sxx_c) - sxp*sxp/nn > 0
           |                    THEN ((sxy + sxy_c) - sxp*syp/nn)
           |                         / ((sxx + sxx_c) - sxp*sxp/nn)
           |                    ELSE 0.0 END AS theta
           |        FROM th),
           |w AS (SELECT *, sm/nt AS mean, sm/nt - s_c/nc AS delta,
           |             SQRT(((ss - sm*sm/nt)/(nt-1.0))/nt
           |                  + ((ss_c - s_c*s_c/nc)/(nc-1.0))/nc) AS se,
           |             (sm/nt - theta*(sx/nt - sxp/nn))
           |               - (s_c/nc - theta*(sx_c/nc - sxp/nn)) AS delta_c,
           |             SQRT((((ss - sm*sm/nt)/(nt-1.0))
           |                   - 2.0*theta*((sxy - sx*sm/nt)/(nt-1.0))
           |                   + theta*theta*((sxx - sx*sx/nt)/(nt-1.0)))/nt
           |                  + (((ss_c - s_c*s_c/nc)/(nc-1.0))
           |                     - 2.0*theta*((sxy_c - sx_c*s_c/nc)/(nc-1.0))
           |                     + theta*theta*((sxx_c - sx_c*sx_c/nc)/(nc-1.0)))/nc)
           |               AS se_c
           |      FROM th2),
           |z AS (SELECT *, CASE WHEN se_c > 0 THEN delta_c / se_c ELSE 0.0 END AS zc
           |      FROM w),
           |p AS (SELECT *,
           |             2.0 * (EXP(-ABS(zc)*ABS(zc)/2.0) / SQRT(2.0*PI())
           |               * (0.319381530 * (1.0/(1.0+0.2316419*ABS(zc)))
           |                  - 0.356563782 * POWER(1.0/(1.0+0.2316419*ABS(zc)), 2)
           |                  + 1.781477937 * POWER(1.0/(1.0+0.2316419*ABS(zc)), 3)
           |                  - 1.821255978 * POWER(1.0/(1.0+0.2316419*ABS(zc)), 4)
           |                  + 1.330274429 * POWER(1.0/(1.0+0.2316419*ABS(zc)), 5)))
           |               AS pc
           |      FROM z),
           |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pc, arm) AS k,
           |              COUNT(*) OVER () AS m
           |       FROM p),
           |q AS (SELECT *,
           |             LEAST(1.0, MIN(pc * m / k) OVER (ORDER BY pc, arm
           |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS qbh
           |      FROM rk)
           |SELECT arm, n, ROUND(mean, 6) AS mean,
           |       ROUND(delta, 6) + 0 AS delta, ROUND(se, 6) AS se,
           |       ROUND(theta, 6) + 0 AS theta,
           |       ROUND(delta_c, 6) + 0 AS delta_cuped,
           |       ROUND(se_c, 6) AS se_cuped,
           |       ROUND(zc, 4) + 0 AS z_cuped, ROUND(pc, 6) AS p_cuped,
           |       k, ROUND(qbh, 6) AS q_bh, qbh <= 0.05 AS discovery,
           |       CAST(0 AS BIGINT) AS mixed_m
           |FROM q ORDER BY arm""".stripMargin))

  /** Q379 — ALWAYS-VALID cluster-randomized A/B/n
    * ([[graft.ops.MultiArm.sequentialClustered]]): q378's geo-assigned
    * four arms monitored CONTINUOUSLY — per contrast the mixture SPRT
    * runs over the moments of per-geo CUMULATIVE means (the
    * cluster-level variance an iid monitor would understate), the
    * running pair-pooled θ adjusts each contrast at every look, and BH
    * per look over the always-valid ADJUSTED p's keeps the k-arm
    * readout FDR-valid under optional stopping (e-BH). The oracle
    * replays the full lattice per arm: per-(geo, day) sums →
    * per-geo cumulative windows → cluster means → per-(day, arm)
    * moments → θ → adjusted Δ/V → ln Λ raw AND adjusted → running max
    * per arm → per-look BH — so an iid variance, a subject-level θ, a
    * θ pooled over all four arms, or a BH over the raw p all
    * hash-fail. */
  val q379 = QueryDef(
    "q379_multi_arm_cluster_seq",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val entry = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("entry_us"))
      val firstConv = ev.join(entry, "user_id")
        .filter(col("event_type") === "purchase" && col("us") >= col("entry_us"))
        .groupBy("user_id").agg(min(col("us")).as("conv_us"))
      val preAct = ev.join(entry, "user_id")
        .filter(col("us") < col("entry_us"))
        .groupBy("user_id").agg(count(lit(1)).as("pre_n"))
      val subjects = entry.join(firstConv, Seq("user_id"), "left")
        .join(preAct, Seq("user_id"), "left")
        .select(
          (col("user_id") % 53).cast("string").as("geo"),
          ((col("user_id") % 53) % 4).cast("string").as("arm"),
          to_date(timestamp_micros(col("entry_us"))).as("entry_day"),
          ((col("conv_us").isNotNull) &&
            (col("conv_us") - col("entry_us")) < lit(7L * 86400000000L))
            .cast("double").as("conv"),
          coalesce(col("pre_n"), lit(0L)).cast("double").as("pre_x"))
      val looks = Tables.events(s, d).select(to_date(col("ts")).as("day")).distinct()
      graft.ops.MultiArm.sequentialClustered(
        subjects, "arm", "entry_day", "conv", "geo", looks, "day",
        control = "0", tau = 0.1, minClusters = 2L, xCol = Some("pre_x"))
        .select(
          col("day").cast("string").as("day"), col("arm"), col("k"),
          col("n"), col("mixed_m"),
          r6(col("mean")).as("mean"),
          (r6(col("delta")) + lit(0.0)).as("delta"),
          (r6(col("log_lambda")) + lit(0.0)).as("log_lambda"),
          r6(col("p_always_valid")).as("p_always_valid"),
          (r6(col("theta")) + lit(0.0)).as("theta"),
          (r6(col("delta_cuped")) + lit(0.0)).as("delta_cuped"),
          r6(col("se_cuped")).as("se_cuped"),
          (r6(col("log_lambda_cuped")) + lit(0.0)).as("log_lambda_cuped"),
          r6(col("p_always_valid_cuped")).as("p_always_valid_cuped"),
          col("m"), col("rk"), r6(col("q_bh")).as("q_bh"), col("discovery"))
        .orderBy("day", "arm")
    },
    Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
           |                  epoch_us(ts) AS us FROM events),
           |en AS (SELECT user_id, MIN(us) AS entry_us FROM e
           |       WHERE event_type='view' GROUP BY 1),
           |cv AS (SELECT e.user_id, MIN(us) AS conv_us FROM e JOIN en USING (user_id)
           |       WHERE event_type='purchase' AND us >= entry_us GROUP BY 1),
           |pa AS (SELECT e.user_id, COUNT(*) AS pre_n FROM e JOIN en USING (user_id)
           |       WHERE us < entry_us GROUP BY 1),
           |s AS (SELECT CAST(en.user_id % 53 AS VARCHAR) AS geo,
           |             CAST((en.user_id % 53) % 4 AS VARCHAR) AS arm,
           |             CAST(make_timestamp(entry_us) AS DATE) AS day,
           |             CASE WHEN conv_us IS NOT NULL
           |                    AND conv_us - entry_us < 604800000000 THEN 1.0
           |                  ELSE 0.0 END AS y,
           |             CAST(COALESCE(pre_n, 0) AS DOUBLE) AS x
           |      FROM en LEFT JOIN cv USING (user_id) LEFT JOIN pa USING (user_id)),
           |looks AS (SELECT DISTINCT day FROM e),
           |daily AS (SELECT geo, day, COUNT(*) AS dn, SUM(y) AS dsy,
           |                 SUM(x) AS dsx FROM s GROUP BY 1,2),
           |geos AS (SELECT DISTINCT geo, arm FROM s),
           |grid AS (SELECT g.geo, g.arm, l.day,
           |                COALESCE(dn,0) AS dn, COALESCE(dsy,0.0) AS dsy,
           |                COALESCE(dsx,0.0) AS dsx
           |         FROM looks l CROSS JOIN geos g
           |         LEFT JOIN daily d ON d.geo=g.geo AND d.day=l.day),
           |cum AS (SELECT geo, arm, day,
           |               CAST(SUM(dn) OVER w AS BIGINT) AS cn,
           |               CAST(SUM(dsy) OVER w AS DOUBLE) AS csy,
           |               CAST(SUM(dsx) OVER w AS DOUBLE) AS csx
           |        FROM grid WINDOW w AS (PARTITION BY geo ORDER BY day)),
           |ad AS (SELECT day, arm,
           |              SUM(CASE WHEN cn > 0 THEN 1 ELSE 0 END) AS n,
           |              SUM(CASE WHEN cn > 0 THEN csy/cn ELSE 0.0 END) AS sm,
           |              SUM(CASE WHEN cn > 0 THEN (csy/cn)*(csy/cn) ELSE 0.0 END) AS ss,
           |              SUM(CASE WHEN cn > 0 THEN csx/cn ELSE 0.0 END) AS sx,
           |              SUM(CASE WHEN cn > 0 THEN (csx/cn)*(csx/cn) ELSE 0.0 END) AS sxx,
           |              SUM(CASE WHEN cn > 0 THEN (csx/cn)*(csy/cn) ELSE 0.0 END) AS sxy
           |       FROM cum GROUP BY 1,2),
           |c AS (SELECT day, n AS n_cl, sm AS s_c, ss AS ss_c, sx AS sx_c,
           |             sxx AS sxx_c, sxy AS sxy_c FROM ad WHERE arm='0'),
           |j AS (SELECT t.arm, t.day, t.n, CAST(t.n AS DOUBLE) AS nt,
           |             t.sm, t.ss, t.sx, t.sxx, t.sxy,
           |             CAST(c.n_cl AS DOUBLE) AS nc, c.s_c, c.ss_c, c.sx_c,
           |             c.sxx_c, c.sxy_c
           |      FROM ad t JOIN c USING (day)
           |      WHERE t.arm <> '0' AND t.n >= 2 AND c.n_cl >= 2),
           |q AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY arm ORDER BY day) AS k,
           |             nt + nc AS nn, sx + sx_c AS sxp, sm + s_c AS syp,
           |             sm/nt AS ma, s_c/nc AS mc,
           |             ((ss - sm*sm/nt)/(nt-1.0))/nt
           |               + ((ss_c - s_c*s_c/nc)/(nc-1.0))/nc AS vv
           |      FROM j),
           |th AS (SELECT *,
           |              CASE WHEN (sxx + sxx_c) - sxp*sxp/nn > 0
           |                   THEN ((sxy + sxy_c) - sxp*syp/nn)
           |                        / ((sxx + sxx_c) - sxp*sxp/nn)
           |                   ELSE 0.0 END AS theta
           |       FROM q),
           |w2 AS (SELECT *,
           |              (ma - theta*(sx/nt - sxp/nn))
           |                - (mc - theta*(sx_c/nc - sxp/nn)) AS delta_c,
           |              (((ss - sm*sm/nt)/(nt-1.0))
           |                - 2.0*theta*((sxy - sx*sm/nt)/(nt-1.0))
           |                + theta*theta*((sxx - sx*sx/nt)/(nt-1.0)))/nt
           |               + (((ss_c - s_c*s_c/nc)/(nc-1.0))
           |                  - 2.0*theta*((sxy_c - sx_c*s_c/nc)/(nc-1.0))
           |                  + theta*theta*((sxx_c - sx_c*sx_c/nc)/(nc-1.0)))/nc
           |                AS vc
           |       FROM th),
           |ll AS (SELECT *,
           |              CASE WHEN vv > 0.0
           |                   THEN 0.5*LN(vv/(vv+0.1*0.1))
           |                        + (ma-mc)*(ma-mc)*(0.1*0.1)/(2.0*vv*(vv+0.1*0.1))
           |                   ELSE 0.0 END AS lnl,
           |              CASE WHEN vc > 0.0
           |                   THEN 0.5*LN(vc/(vc+0.1*0.1))
           |                        + delta_c*delta_c*(0.1*0.1)/(2.0*vc*(vc+0.1*0.1))
           |                   ELSE 0.0 END AS lnlc
           |       FROM w2),
           |p AS (SELECT *,
           |             LEAST(1.0, EXP(-MAX(lnl) OVER (PARTITION BY arm
           |               ORDER BY day
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
           |               AS pav,
           |             LEAST(1.0, EXP(-MAX(lnlc) OVER (PARTITION BY arm
           |               ORDER BY day
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
           |               AS pavc
           |      FROM ll),
           |rk AS (SELECT *, COUNT(*) OVER (PARTITION BY day) AS m,
           |              ROW_NUMBER() OVER (PARTITION BY day ORDER BY pavc, arm) AS rk
           |       FROM p),
           |q2 AS (SELECT *,
           |              LEAST(1.0, MIN(pavc * m / rk) OVER (PARTITION BY day
           |                ORDER BY pavc, arm
           |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS qbh
           |       FROM rk)
           |SELECT CAST(day AS VARCHAR) AS day, arm, k,
           |       CAST(n AS BIGINT) AS n, CAST(0 AS BIGINT) AS mixed_m,
           |       ROUND(ma, 6) AS mean, ROUND(ma - mc, 6) + 0 AS delta,
           |       ROUND(lnl, 6) + 0 AS log_lambda, ROUND(pav, 6) AS p_always_valid,
           |       ROUND(theta, 6) + 0 AS theta,
           |       ROUND(delta_c, 6) + 0 AS delta_cuped,
           |       ROUND(CASE WHEN vc > 0.0 THEN SQRT(vc) ELSE 0.0 END, 6)
           |         AS se_cuped,
           |       ROUND(lnlc, 6) + 0 AS log_lambda_cuped,
           |       ROUND(pavc, 6) AS p_always_valid_cuped,
           |       CAST(m AS BIGINT) AS m, rk,
           |       ROUND(qbh, 6) AS q_bh, qbh <= 0.05 AS discovery
           |FROM q2 ORDER BY day, arm""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q193, q194, q195, q196, q198, q199, q200, q201, q202, q203, q204, q205,
      q206, q207, q209, q212, q213, q227, q231, q238, q239, q251, q263, q267,
      q269, q279, q297, q298, q299, q300, q301, q302, q306, q307, q315, q316,
      q317, q318, q320, q324, q326, q327, q328, q329, q331, q333, q334, q340,
      q341, q342, q350, q352, q353, q361, q370, q372, q373, q374, q375, q377,
      q378, q379)
}
