package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Fmt.r4
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
           |ORDER BY a.o_custkey""".stripMargin))

  def all: Seq[QueryDef] = Seq(q193, q194, q195, q196)
}
