package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation (Kaplan & Meier 1958) — the
  * right-censored time-to-event curve behind "how long until a user
  * converts / churns / a part ships", where naive averages are BIASED by
  * the subjects that have not converted YET (dropping them
  * underestimates, censoring at horizon overestimates; KM handles both).
  *
  * Scale shape: subjects arrive as one row each (duration, event-flag) —
  * whatever keyed aggregation produced them owns the data-sized work.
  * This estimator aggregates them onto the DURATION GRID (bounded by the
  * observation calendar, never by subject count) and runs the risk-set
  * arithmetic and the cumulative product (as exp∘Σ∘ln) over that grid
  * with [[graft.core.Windows.bounded]] — a single-task window over a
  * few-hundred-row input, by design. */
object Survival {

  /** Stratified KM: one curve per `gCol` group. Unlike the pooled
    * estimator this needs NO bounded-window caveat at all — every
    * window is PARTITIONED by the group, so the construction
    * distributes over however many strata exist (each stratum's grid
    * stays calendar-bounded). Returns (g, t, n_risk, events,
    * survival), event rows only. */
  def kaplanMeierBy(
      subjects: DataFrame, gCol: String, tCol: String, eventCol: String): DataFrame = {
    val grid = subjects.groupBy(col(gCol).as("g"), col(tCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("events"),
        count(lit(1)).as("leaving"))
    val total = subjects.groupBy(col(gCol).as("g")).agg(count(lit(1)).as("n_tot"))
    val before = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val factor = lit(1.0) - col("events").cast("double") / col("n_risk")
    grid.join(total, "g")
      .withColumn("n_risk", col("n_tot") - coalesce(sum(col("leaving")).over(before), lit(0L)))
      .filter(col("events") > 0)
      .withColumn("survival",
        when(max(when(factor <= 0.0, 1).otherwise(0)).over(upTo) === 1, lit(0.0))
          .otherwise(exp(sum(when(factor > 0.0, log(factor))).over(upTo))))
      .select(col("g"), col("t"), col("n_risk"), col("events"), col("survival"))
  }

  /** The pooled two-sample risk-set grid every test below shares: one
    * row per POOLED event time with (t, d_t, n_t, d_a, n_a) — total and
    * focal-group events/at-risk. Each group's at-risk at a pooled time
    * must subtract ALL its prior leavings — including censor-only times
    * absent from the event grid — so the risk sets come from a band join
    * of two calendar-bounded grids, not a window over the (incomplete)
    * event grid. Exact integers throughout. */
  private def pooledByTime(
      subjects: DataFrame, gCol: String, tCol: String, eventCol: String,
      focal: String): DataFrame = {
    val leavings = subjects.groupBy(col(gCol).as("g"), col(tCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("d"),
        count(lit(1)).as("leaving"))
    val totals = subjects.groupBy(col(gCol).as("g")).agg(count(lit(1)).as("n_tot"))
    val times = leavings.groupBy("t").agg(sum(col("d")).as("d_all"))
      .filter(col("d_all") > 0).select("t")
    val lv = leavings.select(
      col("g").as("g2"), col("t").as("lt"), col("leaving"), col("d").as("d0"))
    val atRisk = times.crossJoin(totals)
      .join(lv, col("g") === col("g2") && col("lt") <= col("t"), "left")
      .groupBy("t", "g", "n_tot")
      .agg(
        coalesce(sum(when(col("lt") < col("t"), col("leaving"))), lit(0L)).as("gone"),
        coalesce(sum(when(col("lt") === col("t"), col("d0"))), lit(0L)).as("d"))
      .withColumn("n_risk", col("n_tot") - col("gone"))
    atRisk.groupBy("t").agg(
      sum(col("d")).as("d_t"), sum(col("n_risk")).as("n_t"),
      sum(when(col("g") === focal, col("d")).otherwise(lit(0L))).as("d_a"),
      sum(when(col("g") === focal, col("n_risk")).otherwise(lit(0L))).as("n_a"))
  }

  /** Two-sample log-rank test (Mantel-Haenszel): at every POOLED event
    * time, the focal group's observed vs hypergeometric-expected event
    * counts; chi² = (ΣO − ΣE)² / ΣV. All risk sets are exact integers
    * built on the pooled calendar-bounded time grid (zero-filled per
    * group, partitioned windows); only the E/V terms are FP. Returns
    * ONE row: (n_times, obs_a, exp_a, var_sum, chi2) for `focal` = the
    * group the O/E is reported for. */
  def logRank(
      subjects: DataFrame, gCol: String, tCol: String, eventCol: String,
      focal: String): DataFrame = {
    val pa = col("n_a").cast("double") / col("n_t")
    pooledByTime(subjects, gCol, tCol, eventCol, focal)
      .filter(col("n_t") > 1) // variance term needs n_t - 1 > 0
      .agg(
        count(lit(1)).as("n_times"),
        sum(col("d_a")).as("obs_a"),
        sum(col("d_t") * pa).as("exp_a"),
        sum(col("d_t") * pa * (lit(1.0) - pa) *
          (col("n_t") - col("d_t")).cast("double") / (col("n_t") - 1)).as("var_sum"))
      .select(
        col("n_times"), col("obs_a"), col("exp_a"), col("var_sum"),
        (((col("obs_a") - col("exp_a")) * (col("obs_a") - col("exp_a"))) /
          col("var_sum")).as("chi2"))
  }

  /** Log-rank AND Gehan-Wilcoxon statistics from ONE pass over the
    * pooled grid. The Gehan variant weights each time by the pooled
    * at-risk n_t, so EARLY differences dominate — the right test when a
    * treatment's effect fades (crossing hazards dilute the unweighted
    * log-rank). Z_w = Σ w(d_a − E_a), V_w = Σ w²·V_t, chi² = Z²/V with
    * w = 1 (log-rank) and w = n_t (Gehan). One row:
    * (n_times, chi2_logrank, chi2_gehan). */
  def logRankWeighted(
      subjects: DataFrame, gCol: String, tCol: String, eventCol: String,
      focal: String): DataFrame = {
    val pa = col("n_a").cast("double") / col("n_t")
    val oe = col("d_a") - col("d_t") * pa
    val v = col("d_t") * pa * (lit(1.0) - pa) *
      (col("n_t") - col("d_t")).cast("double") / (col("n_t") - 1)
    val w = col("n_t").cast("double")
    pooledByTime(subjects, gCol, tCol, eventCol, focal)
      .filter(col("n_t") > 1)
      .agg(
        count(lit(1)).as("n_times"),
        sum(oe).as("z1"), sum(v).as("v1"),
        sum(w * oe).as("zw"), sum(w * w * v).as("vw"))
      .select(
        col("n_times"),
        (col("z1") * col("z1") / col("v1")).as("chi2_logrank"),
        (col("zw") * col("zw") / col("vw")).as("chi2_gehan"))
  }

  /** Cox proportional-hazards fit for ONE binary covariate (focal group
    * vs rest, Breslow tie handling) — the hazard-ratio ESTIMATE the
    * log-rank test (its score test at β = 0) cannot give. With a binary
    * covariate the partial likelihood depends on the data ONLY through
    * the pooled grid's (d_t, n_t, d_a, n_a): the risk-set sum of e^{βx}
    * is n_a·e^β + (n_t − n_a), so
    * U(β) = Σ_t [d_a − d_t·n_a e^β / (n_a e^β + n_0)] and
    * I(β) = Σ_t [d_t·n_a e^β·n_0 / (n_a e^β + n_0)²].
    *
    * Scale shape: the DISTRIBUTED work is exactly [[logRank]]'s grid
    * build (keyed aggs + band join); the Newton solve then runs on the
    * driver over the COLLECTED grid — bounded by distinct event times
    * (the observation calendar), enforced by `maxTimes` as a declared-
    * judgement refusal (the [[MarkovAttribution]] discipline: a bounded
    * driver solve is honest when the bound is stated and checked).
    * Fixed `iters` Newton steps from β = 0 — deterministic, and at
    * quadratic convergence 8 steps land on the root to machine
    * precision, so a DuckDB recursive-CTE replay matches to 1e-12
    * regardless of each engine's grid-sum order. Returns one row:
    * (n_times, beta, hazard_ratio, se, wald_chi2). */
  def coxTwoGroup(
      subjects: DataFrame, gCol: String, tCol: String, eventCol: String,
      focal: String, iters: Int = 8, maxTimes: Int = 100000): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val grid = pooledByTime(subjects, gCol, tCol, eventCol, focal)
      .select("t", "d_t", "n_t", "d_a", "n_a")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(identity)
    require(grid.length <= maxTimes,
      s"cox grid has ${grid.length} event times > maxTimes=$maxTimes — the driver " +
        "solve is bounded by declared judgement; coarsen the duration unit or raise " +
        "the cap knowingly")
    def sums(b: Double): (Double, Double) = {
      var u = 0.0; var i2 = 0.0
      grid.foreach { case (dt, nt, da, na) =>
        val n0 = (nt - na).toDouble
        val ea = na * math.exp(b)
        u += da - dt * ea / (ea + n0)
        i2 += dt * ea * n0 / ((ea + n0) * (ea + n0))
      }
      (u, i2)
    }
    var beta = 0.0
    for (_ <- 1 to iters) { val (u, i2) = sums(beta); beta += u / i2 }
    // SE and Wald use the information AT the final beta (what the oracle
    // replay computes), not at the last pre-update point
    val info = sums(beta)._2
    Seq((grid.length.toLong, beta, math.exp(beta), 1.0 / math.sqrt(info),
      beta * beta * info))
      .toDF("n_times", "beta", "hazard_ratio", "se", "wald_chi2")
  }

  /** Aalen-Johansen cumulative incidence for TWO competing causes —
    * "what fraction has CONVERTED by day t vs CHURNED by day t" when
    * each subject can only do one first. 1 − KM treats the competing
    * cause as censoring and OVERSTATES both incidences (subjects who
    * churned can never convert — they are not interchangeable with the
    * still-at-risk); Aalen-Johansen allocates the any-cause survival
    * mass correctly: CIF_k(t) = Σ_{s≤t} S(s⁻)·d_k(s)/n(s) with S the
    * ANY-cause KM, and CIF_1 + CIF_2 = 1 − S always.
    *
    * `causeCol`: 1 / 2 = causes, 0 = right-censored. Same scale shape
    * as [[kaplanMeier]] — one aggregation onto the calendar-bounded
    * duration grid, then bounded-window arithmetic over it. Returns one
    * row per time with any event: (t, n_risk, d1, d2, cif1, cif2). */
  def competingRisks(subjects: DataFrame, tCol: String, causeCol: String): DataFrame = {
    val grid = subjects.groupBy(col(tCol).cast("long").as("t"))
      .agg(
        sum(when(col(causeCol) === 1, 1L).otherwise(0L)).as("d1"),
        sum(when(col(causeCol) === 2, 1L).otherwise(0L)).as("d2"),
        count(lit(1)).as("leaving"))
    val total = subjects.agg(count(lit(1)).as("n_tot"))
    val before = graft.core.Windows.bounded(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = graft.core.Windows.bounded(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val d = col("d1") + col("d2")
    // an absorbing any-cause step (d = n_risk) self-terminates the grid —
    // nobody remains to leave later, so no later rows exist and the
    // guarded ln never sees 0; censor-only times contribute ln(1) = 0
    val lnFactor = when(d < col("n_risk") && d > 0,
      log(lit(1.0) - d.cast("double") / col("n_risk"))).otherwise(lit(0.0))
    grid.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_tot") - coalesce(sum(col("leaving")).over(before), lit(0L)))
      .withColumn("s_prev", exp(coalesce(sum(lnFactor).over(before), lit(0.0))))
      .withColumn("cif1",
        sum(col("s_prev") * col("d1").cast("double") / col("n_risk")).over(upTo))
      .withColumn("cif2",
        sum(col("s_prev") * col("d2").cast("double") / col("n_risk")).over(upTo))
      .filter(d > 0)
      .select(col("t"), col("n_risk"), col("d1"), col("d2"), col("cif1"), col("cif2"))
  }

  /** KM curve over per-subject rows: `tCol` integral duration,
    * `eventCol` 1 = event observed, 0 = right-censored. Returns one row
    * per EVENT time: (t, n_risk, events, survival). */
  def kaplanMeier(subjects: DataFrame, tCol: String, eventCol: String): DataFrame = {
    val grid = subjects.groupBy(col(tCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("events"),
        count(lit(1)).as("leaving"))
    val total = subjects.agg(count(lit(1)).as("n_tot"))
    val before = graft.core.Windows.bounded(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = graft.core.Windows.bounded(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // a step where EVERY at-risk subject converts has factor 0: survival
    // is exactly 0 from there on, and ln(0) must never reach the product
    // (Spark's null-log would silently DROP the term; DuckDB errors)
    val factor = lit(1.0) - col("events").cast("double") / col("n_risk")
    grid.crossJoin(broadcast(total))
      .withColumn("n_risk", col("n_tot") - coalesce(sum(col("leaving")).over(before), lit(0L)))
      .filter(col("events") > 0)
      .withColumn("survival",
        when(max(when(factor <= 0.0, 1).otherwise(0)).over(upTo) === 1, lit(0.0))
          .otherwise(exp(sum(when(factor > 0.0, log(factor))).over(upTo))))
      .select(col("t"), col("n_risk"), col("events"), col("survival"))
  }
}
