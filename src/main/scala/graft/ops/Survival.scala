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
      focal: String, iters: Int = 8, maxTimes: Int = 100000,
      tol: Double = 1e-9): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    // the cap is IN the plan (CollectLimit), not just checked after: the
    // driver never receives more than maxTimes + 1 rows even when the
    // refusal fires — the bound must protect against exactly the grid it
    // refuses (the BayesAb.arm-probe idiom)
    val grid = pooledByTime(subjects, gCol, tCol, eventCol, focal)
      .select("t", "d_t", "n_t", "d_a", "n_a")
      .limit(maxTimes + 1)
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
    // convergence-bounded like [[coxPH]]'s fit — here each pass is
    // driver arithmetic over the collected grid (no job saved), but the
    // stopping semantics must match the matrix path so the two fits
    // answer identically on the same data
    var it = 0
    var done = false
    while (it < iters && !done) {
      val (u, i2) = sums(beta)
      val step = u / i2
      beta += step
      it += 1
      done = math.abs(step) <= tol * (1.0 + math.abs(beta))
    }
    // SE and Wald use the information AT the final beta (what the oracle
    // replay computes), not at the last pre-update point
    val info = sums(beta)._2
    Seq((grid.length.toLong, beta, math.exp(beta), 1.0 / math.sqrt(info),
      beta * beta * info))
      .toDF("n_times", "beta", "hazard_ratio", "se", "wald_chi2")
  }

  /** MULTI-covariate Cox proportional hazards (Efron ties by default,
    * Breslow available; matrix Newton-Raphson) — the general form
    * [[coxTwoGroup]] special-cases:
    * hazard h(t|x) = h₀(t)·e^{βᵀx} with p arbitrary (binary OR
    * continuous) covariates fit jointly, so each hazard ratio is
    * ADJUSTED for the others — the question "does the treatment arm
    * still convert faster once activity level is controlled for" that
    * no sequence of two-group fits can answer.
    *
    * Scale shape: each Newton iteration is ONE keyed aggregation over
    * the persisted subject frame — per distinct observed time u, the
    * leaving-mass sums a0(u)=Σ_{T=u} w, a1_k(u)=Σ x_k w,
    * a2_kl(u)=Σ x_k x_l w with w=e^{βᵀx}, plus the β-independent event
    * sums (d, Σ_event x_k). Risk-set sums then come from a DESCENDING
    * cumulative over the collected calendar-bounded grid (R_t = all
    * subjects leaving at u ≥ t), never from a times×subjects join: the
    * data-sized work per iteration is one hash aggregate, the driver
    * holds grid-sized state only (`maxTimes`-capped, the
    * declared-judgement refusal discipline), and the p×p solve is
    * driver-side Gaussian elimination. Fixed `iters` steps from β = 0 —
    * deterministic, quadratically convergent, oracle-replayable.
    *
    * STRATIFICATION (`strataCol`): each stratum keeps its OWN baseline
    * hazard — the fix when proportionality fails on a nuisance factor
    * (region, device, cohort): risk sets never cross strata, so the
    * stratum's level differences cannot bias β, while the covariate
    * effects are still fit JOINTLY across all strata (score and
    * information simply SUM over the per-stratum grids — the partial
    * likelihood is a product). Same distributed shape: the per-iteration
    * aggregation keys by (stratum, time) instead of (time); `maxTimes`
    * caps the TOTAL collected grid.
    *
    * TIES (`ties`): durations here are integer-granular, so tied event
    * times are the NORM, and the approximation chosen for them is not a
    * detail — Breslow treats all d tied events as sharing the full
    * risk-set denominator S₀^d, which biases β toward 0 as tie density
    * grows; Efron (the default, as in R's `coxph`) lets the j-th tied
    * event see the risk set with j/d of the tied events' own mass
    * removed: denominator Π_j (S₀ − (j/d)·E₀) where E₀ is the
    * e^{βᵀx}-mass of the events AT that time. The per-iteration
    * aggregation just adds the event-weighted moments (E₀, E₁_k, E₂_kl)
    * to the same single pass; the driver loop then costs Σ_t d_t (=
    * total events) arithmetic per iteration instead of n_times — flops,
    * not memory (state stays grid-sized), the same loop every standard
    * implementation runs. `ties = "breslow"` keeps the closed form.
    *
    * SEPARATION: a covariate that perfectly orders the event times makes
    * the partial likelihood MONOTONE in its β — Newton walks β toward
    * ±∞, the information flattens, and the "estimate" after any fixed
    * iteration count is an artifact of the cutoff with a meaningless
    * Wald CI. The fit REFUSES rather than reports: after the fixed
    * Newton steps the final step length must be below 1e-6·(1+max|β|)
    * (a quadratically-convergent fit lands at machine precision; a
    * monotone likelihood keeps stepping), and any non-finite iterate
    * refuses immediately, naming the diverging covariate.
    *
    * FIRTH (`firth = true`): instead of refusing, ESTIMATE under
    * separation with Firth's penalized partial likelihood
    * l*(β) = l(β) + ½·log|I(β)| (Heinze & Schemper 2001, the `coxphf`
    * estimator): the Jeffreys-prior penalty pulls the mode back from
    * ±∞, so a separated covariate gets a finite, first-order-unbiased
    * β with a usable (if still Wald) SE. The modified score is
    * U*_k = U_k + ½·tr(I⁻¹·∂I/∂β_k), and ∂I/∂β_k is the risk-set
    * distribution's THIRD central moment — the same single aggregation
    * pass simply also carries the third weighted moments (a3_klm =
    * Σ x_k x_l x_m·w, plus the event-only e3 under Efron); the extra
    * C(p+2,3) agg columns exist only when `firth` is on. Newton steps
    * on (I, U*); SE stays √diag(I⁻¹) at the penalized estimate, as in
    * coxphf. The convergence discipline is UNCHANGED (the penalized
    * likelihood always has a finite maximizer, so a fit that still
    * steps after `iters` iterations is a genuine non-convergence and
    * still refuses).
    *
    * COUNTING-PROCESS input (`startCol`): rows become (start, stop]
    * risk intervals — the Andersen-Gill form behind the two asks a
    * plain duration column cannot express: TIME-VARYING covariates
    * (split a subject at each covariate change; only the interval
    * covering an event time contributes its x to that risk set — the
    * honest fix for immortal-time bias, where coding "ever treated" as
    * a baseline covariate credits treatment with the survival time
    * spent untreated before it) and LEFT TRUNCATION (delayed entry:
    * a subject enters the risk set only after start). Entry is the
    * same descending grid walk with NEGATIVE mass at the start times
    * (risk set at u = Σ_{stop≥u} − Σ_{start≥u}), so Efron/Breslow,
    * strata, Firth, and the maxTimes discipline all apply unchanged;
    * a row whose start equals an event time is NOT yet at risk there
    * (strict entry), and start < stop is enforced.
    *
    * WARM START (`betaStart`): initialize Newton at a previous fit's β̂
    * instead of 0 — the ANALOG of `startCol`'s delayed entry, for the
    * optimizer: at refresh cadence (nightly refit over a slightly-grown
    * cohort) the previous β̂ is the right prior, and quadratic
    * convergence from a near-solution start lands in 1-2 passes instead
    * of 4-6 — each saved pass is one full-data aggregation. Persist the
    * fit frame beside the table (any versioned-table commit) and feed
    * it back through [[betaStartFrom]]; the ESTIMATE is unchanged (the
    * stationary point does not depend on the start — spec-pinned to
    * 1e-9 with strictly fewer jobs). A stale or wrong-length start is
    * refused / converges anyway: Newton's basin at these likelihoods is
    * wide, and the separation discipline still applies.
    *
    * Returns one row per covariate: (covariate, n_times, beta,
    * hazard_ratio, se, wald_chi2) with se from the inverse information
    * at the final β. */
  def coxPH(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      iters: Int = 8, maxTimes: Int = 100000,
      strataCol: Option[String] = None, ties: String = "efron",
      firth: Boolean = false, startCol: Option[String] = None,
      clusterCol: Option[String] = None, tol: Double = 1e-9,
      betaStart: Option[Seq[Double]] = None): DataFrame =
    coxPHImpl(subjects, xCols, tCol, eventCol, iters, maxTimes, strataCol,
      ties, firth, startCol, clusterCol, tol, betaStart)._1

  /** The warm-start vector from a PERSISTED [[coxPH]]/[[coxPHDiag]] fit
    * frame, aligned to `xCols` by covariate NAME (column order in the
    * new fit call need not match the stored frame). Bounded collect —
    * the frame is p rows. Refuses by name when a covariate is missing:
    * a renamed model must re-fit cold, not silently start one covariate
    * at zero. */
  def betaStartFrom(fit: DataFrame, xCols: Seq[String]): Seq[Double] = {
    val m = fit.select("covariate", "beta")
      .limit(xCols.length + 65).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val missing = xCols.filterNot(m.contains)
    require(missing.isEmpty,
      s"stored fit has no beta for covariate(s) ${missing.mkString(", ")} — " +
        s"stored: ${m.keys.toSeq.sorted.mkString(", ")}; refit cold")
    xCols.map(m)
  }

  /** [[coxPH]] plus the convergence DIAGNOSTIC columns (n_iters,
    * converged): how many Newton passes the fit actually spent under the
    * `iters` cap before the ‖Δβ‖∞ ≤ tol·(1+‖β‖∞) exit fired. A
    * well-conditioned fit lands in 4-6 passes; n_iters == iters says the
    * cap bound first (and the separation discipline then decides whether
    * the result stands — a fit that RETURNS has always passed the final
    * step check, so `converged` is the honest constant true; genuine
    * non-convergence refuses with the separation diagnosis instead of
    * reporting a row). Each pass is one full-data aggregation, so
    * n_iters IS the query's dominant cost at scale. */
  def coxPHDiag(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      iters: Int = 8, maxTimes: Int = 100000,
      strataCol: Option[String] = None, ties: String = "efron",
      firth: Boolean = false, startCol: Option[String] = None,
      clusterCol: Option[String] = None, tol: Double = 1e-9,
      betaStart: Option[Seq[Double]] = None): DataFrame = {
    val (df, nIters) = coxPHImpl(subjects, xCols, tCol, eventCol, iters,
      maxTimes, strataCol, ties, firth, startCol, clusterCol, tol, betaStart)
    df.withColumn("n_iters", org.apache.spark.sql.functions.lit(nIters))
      .withColumn("converged", org.apache.spark.sql.functions.lit(true))
  }

  private def coxPHImpl(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      iters: Int, maxTimes: Int,
      strataCol: Option[String], ties: String,
      firth: Boolean, startCol: Option[String],
      clusterCol: Option[String], tol: Double,
      betaStart: Option[Seq[Double]] = None): (DataFrame, Int) = {
    val spark = subjects.sparkSession
    import spark.implicits._
    clusterCol.foreach { _ =>
      require(ties == "breslow",
        "cluster-robust SEs use Breslow score residuals — refit with " +
          "ties = \"breslow\" (Efron-weighted residuals would not sum to zero " +
          "at the Efron MLE, silently mis-sizing the sandwich)")
    }
    val (beta, cov, nTimes, grid, nIters) =
      coxFit(subjects, xCols, tCol, eventCol, iters, maxTimes, strataCol, ties,
        firth, startCol, tol, betaStart)
    val robustSe: Option[Array[Double]] = clusterCol.map { cc =>
      val meat = sandwichMeat(subjects, xCols, tCol, eventCol, strataCol,
        startCol, cc, beta, grid)
      val p = xCols.length
      // V = I⁻¹·M·I⁻¹ (cov IS I⁻¹)
      val mi = Array.tabulate(p, p)((i, j) =>
        (0 until p).map(a => meat(i)(a) * cov(a)(j)).sum)
      Array.tabulate(p)(k =>
        math.sqrt((0 until p).map(a => cov(k)(a) * mi(a)(k)).sum))
    }
    val df = xCols.indices.map { k =>
      val se = math.sqrt(cov(k)(k))
      (xCols(k), nTimes, beta(k), math.exp(beta(k)), se,
        robustSe.map(_(k)).getOrElse(se),
        beta(k) * beta(k) / cov(k)(k))
    }.toDF("covariate", "n_times", "beta", "hazard_ratio", "se", "robust_se",
        "wald_chi2") match {
      case d if clusterCol.isEmpty => d.drop("robust_se")
      case d => d
    }
    (df, nIters)
  }

  /** The Lin-Wei/Lee-Wei-Amato sandwich "meat" Σ_clusters C·Cᵀ with
    * C = Σ_{rows in cluster} U_i and U_i the per-row Breslow score
    * residual. Everything data-sized stays declarative: the grid prefix
    * table (event times × (H₀, x̄, G_k = Σ dH₀·x̄_k) per stratum) is
    * grid-sized driver arithmetic broadcast back through TWO as-of
    * joins (at each row's stop and — counting-process only — start), the
    * residual is pure column math (U = ev·(x − x̄(stop)) −
    * w·(x·ΔH₀ − ΔG)), and the cluster fold is one keyed aggregation
    * followed by a p²-sized reduce. */
  private def sandwichMeat(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      strataCol: Option[String], startCol: Option[String], clusterCol: String,
      beta: Array[Double],
      grid: Array[(String, Long, Long, Double, Double, Array[Double], Array[Double], Array[Double], Array[Double])])
      : Array[Array[Double]] = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val p = xCols.length
    // event-time prefix table per stratum: descending walk rebuilds
    // S₀/S₁ (exactly the fit's arithmetic), ascending walk accumulates
    // H₀ and G_k = Σ (d/S₀)·(S₁_k/S₀)
    val cells = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Double, Array[Double])] // (g, t, dh, xbar)
    var stratum: String = null
    var s0 = 0.0
    val s1 = Array.fill(p)(0.0)
    grid.foreach { case (g, t, d, a0, _, a1, _, _, _) =>
      if (g != stratum) {
        stratum = g; s0 = 0.0; java.util.Arrays.fill(s1, 0.0)
      }
      s0 += a0
      var k = 0; while (k < p) { s1(k) += a1(k); k += 1 }
      if (d > 0) cells += ((g, t, d.toDouble / s0, Array.tabulate(p)(s1(_) / s0)))
    }
    val prefix = cells.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      var h0 = 0.0
      val gk = Array.fill(p)(0.0)
      rs.sortBy(_._2).map { case (_, t, dh, xbar) =>
        h0 += dh
        var k = 0; while (k < p) { gk(k) += dh * xbar(k); k += 1 }
        (g, t, h0, xbar.toSeq, gk.clone().toSeq)
      }
    }.toDF("g", "t", "h0", "xbar", "gk")
    val probe = subjects.select(
      strataCol.fold(lit("__all"))(c => col(c).cast("string")).as("g") +:
        col(tCol).cast("long").as("t") +:
        col(eventCol).cast("int").as("ev") +:
        col(clusterCol).cast("string").as("cl") +:
        xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"x$i") }
          :+ startCol.fold(lit(Long.MinValue))(c => col(c).cast("long")).as("t0"): _*)
    val zeros = array(Seq.fill(p)(lit(0.0)): _*)
    val atStop = AsOf.join(probe, prefix, "g", "t", "t",
      Seq("h0", "xbar", "gk"))
      .withColumnRenamed("asof_h0", "h0_stop")
      .withColumnRenamed("asof_xbar", "xbar_stop")
      .withColumnRenamed("asof_gk", "gk_stop")
      .drop("asof_t")
    val both =
      if (startCol.isEmpty)
        atStop.withColumn("h0_start", lit(0.0)).withColumn("gk_start", zeros)
      else {
        val renamed = atStop.withColumnRenamed("t", "t_stop")
          .withColumnRenamed("t0", "t")
        AsOf.join(renamed, prefix, "g", "t", "t", Seq("h0", "gk"))
          .withColumn("h0_start", coalesce(col("asof_h0"), lit(0.0)))
          .withColumn("gk_start", coalesce(col("asof_gk"), zeros))
          .drop("asof_h0", "asof_gk", "asof_t")
      }
    val w = exp((0 until p).map(i => col(s"x$i") * lit(beta(i))).reduce(_ + _))
    val us = (0 until p).map { k =>
      val xk = col(s"x$k")
      val evTerm = col("ev").cast("double") *
        (xk - coalesce(element_at(col("xbar_stop"), k + 1), lit(0.0)))
      val dH = coalesce(col("h0_stop"), lit(0.0)) - col("h0_start")
      val dG = coalesce(element_at(col("gk_stop"), k + 1), lit(0.0)) -
        element_at(col("gk_start"), k + 1)
      (evTerm - w * (xk * dH - dG)).as(s"u$k")
    }
    val perCluster = both.select(col("cl") +: us: _*)
      .groupBy("cl")
      .agg(sum(col("u0")).as("c0"),
        (1 until p).map(k => sum(col(s"u$k")).as(s"c$k")): _*)
    val pairs = for { k <- 0 until p; l <- k until p } yield (k, l)
    val mRow = perCluster.agg(
      sum(col("c0") * col("c0")).as("m_0_0"),
      pairs.tail.map { case (k, l) =>
        sum(col(s"c$k") * col(s"c$l")).as(s"m_${k}_$l")
      }: _*).head()
    val m = Array.fill(p, p)(0.0)
    pairs.zipWithIndex.foreach { case ((k, l), i) =>
      val v = mRow.getDouble(i)
      m(k)(l) = v; m(l)(k) = v
    }
    m
  }

  /** Baseline cumulative hazard + ADJUSTED survival curves from the
    * fitted Cox model — the `survfit(coxph(...))` analog: what a
    * survival analysis actually reports to a reader ("the adjusted
    * conversion curve per arm, covariates held at the profile"). The
    * baseline estimator matches the tie handling of the fit: Breslow
    * dH₀(u) = d_u / S₀(u, β̂); Efron dH₀(u) = Σ_{j<d} 1/(S₀ − (j/d)·E₀)
    * (the same within-tie mass removal the score used). Each profile's
    * curve is S(t|x) = exp(−H₀(t)·e^{β̂ᵀx}); stratified fits get one
    * baseline PER STRATUM (that is the point of stratifying).
    *
    * Scale shape: identical to [[coxPH]] — the baseline reads the SAME
    * final-β grid the SE pass already collected (no extra aggregation),
    * and the output is (event times × profiles), grid-sized under the
    * `maxTimes` discipline.
    *
    * @param profiles (name, covariate vector) pairs, e.g.
    *                 `Seq("ctrl" -> Seq(0.0), "treat" -> Seq(1.0))`.
    * @return one row per (stratum, event time, profile):
    *         (stratum, t, profile, h0_cum, survival). */
  def coxSurvival(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      profiles: Seq[(String, Seq[Double])],
      iters: Int = 8, maxTimes: Int = 100000,
      strataCol: Option[String] = None, ties: String = "efron",
      firth: Boolean = false, startCol: Option[String] = None,
      tol: Double = 1e-9): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    require(profiles.nonEmpty, "coxSurvival needs at least one covariate profile")
    require(profiles.forall(_._2.length == xCols.length),
      s"every profile must supply ${xCols.length} covariate value(s)")
    require(profiles.map(_._1).distinct.size == profiles.size,
      "profile names must be distinct")
    val (beta, _, _, grid, _) =
      coxFit(subjects, xCols, tCol, eventCol, iters, maxTimes, strataCol, ties,
        firth, startCol, tol)
    val efron = ties == "efron"
    // grid is sorted (stratum, t DESC): the running a0 sum IS S₀(t)
    val increments = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    var stratum: String = null
    var s0 = 0.0
    grid.foreach { case (g, t, d, a0, e0, _, _, _, _) =>
      if (g != stratum) { stratum = g; s0 = 0.0 }
      s0 += a0
      if (d > 0) {
        val dH =
          if (!efron) d.toDouble / s0
          else {
            var acc = 0.0
            var j = 0L
            while (j < d) { acc += 1.0 / (s0 - (j.toDouble / d) * e0); j += 1 }
            acc
          }
        increments += ((g, t, dH))
      }
    }
    val curves = increments.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (g, rs) =>
        var h = 0.0
        rs.sortBy(_._2).map { case (_, t, dH) => h += dH; (g, t, h) }
    }
    curves.flatMap { case (g, t, h0) =>
      profiles.map { case (name, x) =>
        val lp = x.zip(beta).map { case (xi, bi) => xi * bi }.sum
        (g, t, name, h0, math.exp(-h0 * math.exp(lp)))
      }
    }.toDF("stratum", "t", "profile", "h0_cum", "survival")
  }

  /** Adjusted survival curves WITH pointwise 95% confidence bands —
    * what [[coxSurvival]]'s point curves cannot support a reading of
    * ("is the day-30 gap real or noise"). The curve's cumulative hazard
    * H(t|x) = H₀(t)·e^{β̂ᵀx} carries two independent noise sources:
    * the baseline martingale term e^{2β̂ᵀx}·V(t) with V(t) = Σ_{u≤t}
    * v_u (the same per-increment variances the RMST family uses) and
    * the delta-method β̂ term gᵀI⁻¹g with
    * g_k = r·(x_k·H₀(t) − M_k(t)), M_k(t) = Σ_{u≤t} m_uk = −Σ ∂dH/∂β_k.
    * Bands come from the hazard scale (always inside (0, 1] without
    * ad-hoc clamping at the low end): ci = exp(−(H ∓ z·se_H));
    * `se` is reported on the survival scale (S·se_H). All arithmetic
    * rides the final-β grid — zero passes beyond the fit. Returns one
    * row per (stratum, event time, profile): (stratum, t, profile,
    * h0_cum, survival, se, ci_lo, ci_hi). */
  def coxSurvivalBands(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      profiles: Seq[(String, Seq[Double])],
      iters: Int = 8, maxTimes: Int = 100000,
      strataCol: Option[String] = None, ties: String = "efron",
      firth: Boolean = false, startCol: Option[String] = None,
      tol: Double = 1e-9): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    require(profiles.nonEmpty, "coxSurvivalBands needs at least one covariate profile")
    require(profiles.forall(_._2.length == xCols.length),
      s"every profile must supply ${xCols.length} covariate value(s)")
    require(profiles.map(_._1).distinct.size == profiles.size,
      "profile names must be distinct")
    val (beta, cov, _, grid, _) =
      coxFit(subjects, xCols, tCol, eventCol, iters, maxTimes, strataCol, ties,
        firth, startCol, tol)
    val p = xCols.length
    val cells = baselineCells(grid, ties == "efron", p)
    val rs = profiles.map { case (name, x) =>
      (name, x, math.exp(x.zip(beta).map { case (xi, bi) => xi * bi }.sum))
    }
    val out = cells.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (g, cs) =>
      var h = 0.0
      var vC = 0.0
      val mC = Array.fill(p)(0.0)
      cs.sortBy(_._2).flatMap { case (_, t, dH, v, m) =>
        h += dH
        vC += v
        var k = 0
        while (k < p) { mC(k) += m(k); k += 1 }
        rs.map { case (name, x, r) =>
          var vb = 0.0
          var a = 0
          while (a < p) {
            val ga = r * (x(a) * h - mC(a))
            var b = 0
            while (b < p) {
              vb += ga * cov(a)(b) * (r * (x(b) * h - mC(b)))
              b += 1
            }
            a += 1
          }
          val seH = math.sqrt(r * r * vC + vb)
          val s = math.exp(-h * r)
          (g, t, name, h, s, s * seH,
            math.exp(-(h * r + 1.959964 * seH)),
            math.min(1.0, math.exp(-(h * r - 1.959964 * seH))))
        }
      }
    }
    out.toDF("stratum", "t", "profile", "h0_cum", "survival", "se",
      "ci_lo", "ci_hi")
  }

  /** Proportional-hazards ASSUMPTION test (the `cox.zph` analog) — the
    * diagnostic every Cox readout should clear before its hazard ratio
    * is quoted: a SCORE TEST of β_k(t) = β_k + θ_k·g(t) at θ = 0 with
    * the identity time transform g(t) = t, per covariate with the
    * others held at β̂. A significant θ means the effect DRIFTS with
    * time and the single hazard ratio is an average over a moving
    * target (report strata, a time-varying term via `startCol`
    * splitting, or RMST instead).
    *
    * All arithmetic is GRID-sized off the fitted model's final pass:
    * U_k = Σ_t g_t·(Σ_event x_k − d_t·x̄_k(t)) and the effective
    * information A_kk − B_k·I⁻¹·B_kᵀ with A = Σ g²V(t), B = Σ g·V(t),
    * I = Σ V(t) (the per-time information increments the fit already
    * sums) — no subject-sized work beyond the fit itself. Breslow ties
    * by construction (the per-time residual decomposition). 1-dof
    * upper-tail p via the exact √χ² normal identity (same fixed A&S
    * polynomial both engines).
    *
    * @return one row per covariate:
    *         (covariate, chi2, p_ph, violated @ p < 0.05). */
  def phAssumption(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      iters: Int = 8, maxTimes: Int = 100000,
      strataCol: Option[String] = None,
      startCol: Option[String] = None, tol: Double = 1e-9): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val p = xCols.length
    val (_, cov, _, grid, _) =
      coxFit(subjects, xCols, tCol, eventCol, iters, maxTimes, strataCol,
        "breslow", firth = false, startCol, tol)
    val pairs = (for { k <- 0 until p; l <- k until p } yield (k, l)).toArray
    val pIdx = Array.fill(p, p)(0)
    pairs.zipWithIndex.foreach { case ((k, l), i) => pIdx(k)(l) = i; pIdx(l)(k) = i }
    val u = Array.fill(p)(0.0)
    val aDiag = Array.fill(p)(0.0)
    val bMat = Array.fill(p, p)(0.0)
    var stratum: String = null
    var s0 = 0.0
    val s1 = Array.fill(p)(0.0)
    val s2 = Array.fill(pairs.length)(0.0)
    grid.foreach { case (g, t, d, a0, _, a1, _, a2, sx) =>
      if (g != stratum) {
        stratum = g; s0 = 0.0
        java.util.Arrays.fill(s1, 0.0); java.util.Arrays.fill(s2, 0.0)
      }
      s0 += a0
      var k = 0; while (k < p) { s1(k) += a1(k); k += 1 }
      var i = 0; while (i < pairs.length) { s2(i) += a2(i); i += 1 }
      if (d > 0) {
        val gt = t.toDouble
        var kk = 0
        while (kk < p) {
          u(kk) += gt * (sx(kk) - d * s1(kk) / s0)
          kk += 1
        }
        var ii = 0
        while (ii < pairs.length) {
          val (k1, l1) = pairs(ii)
          val v = d * (s2(ii) / s0 - s1(k1) * s1(l1) / (s0 * s0))
          bMat(k1)(l1) += gt * v
          if (k1 != l1) bMat(l1)(k1) += gt * v
          if (k1 == l1) aDiag(k1) += gt * gt * v
          ii += 1
        }
      }
    }
    // Φ via the family's fixed A&S 7.1.26 polynomial (scalar form); a
    // 1-dof chi-square upper tail is EXACTLY the two-sided normal p of √χ²
    def pOf(chi2: Double): Double = {
      val a = math.sqrt(chi2)
      val tt = 1.0 / (1.0 + 0.2316419 * a)
      2.0 * (math.exp(-a * a / 2.0) / math.sqrt(2.0 * math.Pi) *
        (0.319381530 * tt - 0.356563782 * tt * tt + 1.781477937 * tt * tt * tt -
          1.821255978 * tt * tt * tt * tt + 1.330274429 * tt * tt * tt * tt * tt))
    }
    (0 until p).map { k =>
      // effective information for θ_k: A_kk − B_k·I⁻¹·B_kᵀ (cov IS I⁻¹)
      var proj = 0.0
      var a = 0
      while (a < p) {
        var b = 0
        while (b < p) { proj += bMat(k)(a) * cov(a)(b) * bMat(k)(b); b += 1 }
        a += 1
      }
      val denom = aDiag(k) - proj
      require(denom > 0,
        s"degenerate PH-test information for '${xCols(k)}' — a single event " +
          "time (or collinear g) leaves the drift direction unidentified")
      val chi2 = u(k) * u(k) / denom
      (xCols(k), chi2, pOf(chi2), pOf(chi2) < 0.05)
    }.toDF("covariate", "chi2", "p_ph", "violated")
  }

  /** Restricted mean survival time per (stratum, profile) from
    * [[coxSurvival]] curves — "how many event-free days does each arm
    * average by day τ", the readout a hazard ratio alone cannot give
    * (and the honest summary when proportionality is doubtful). Step
    * integration of the right-continuous curve: S = 1 on [0, t₁), then
    * each step contributes S(tᵢ)·(min(tᵢ₊₁, τ) − tᵢ) — q314's KM
    * convention, applied to ADJUSTED curves. A group whose FIRST event
    * time already exceeds the horizon has S = 1 on all of [0, τ] and
    * reports rmst = τ exactly (the distinct group keys are joined back
    * rather than silently dropped by the horizon filter). The window is
    * PARTITIONED by (stratum, profile) — distributes over any profile
    * count; the input is already the grid-sized [[coxSurvival]] output.
    * Returns (stratum, profile, horizon, rmst). */
  def rmstFromCurves(curves: DataFrame, horizon: Long): DataFrame = {
    require(horizon > 0, s"horizon must be positive, got $horizon")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum", "profile").orderBy("t")
    val integrated = curves
      .filter(col("t") <= horizon)
      .withColumn("next_t",
        least(coalesce(lead(col("t"), 1).over(w), lit(horizon)), lit(horizon)))
      .withColumn("area",
        col("survival") * (col("next_t") - col("t")).cast("double"))
      .groupBy("stratum", "profile")
      .agg(min(col("t")).as("t1"), sum(col("area")).as("tail_area"))
    curves.select("stratum", "profile").distinct()
      .join(integrated, Seq("stratum", "profile"), "left")
      .select(
        col("stratum"), col("profile"), lit(horizon).as("horizon"),
        coalesce(
          least(col("t1"), lit(horizon)).cast("double") + col("tail_area"),
          lit(horizon.toDouble)).as("rmst"))
  }

  /** Adjusted RMST per (stratum, profile) WITH uncertainty — the
    * readout [[rmstFromCurves]] cannot support a decision without: the
    * same step integral of S(t|x) = exp(−H₀(t)·e^{β̂ᵀx}) up to
    * `horizon`, plus its standard error and 95% Wald CI from the
    * Greenwood-type variance of the integrated survival. The baseline
    * increments dH₀(t_j) have (martingale-independent) variance
    * v_j = d_j/S₀(t_j)² (Breslow; the within-tie sum of 1/(S₀−(l/d)E₀)²
    * under Efron), a perturbation at t_j scales every later S by
    * −e^{β̂ᵀx}, so ∂RMST/∂dH_j = −e^{β̂ᵀx}·A_j with A_j the curve's
    * TAIL AREA from t_j, and
    * var(RMST) = e^{2β̂ᵀx}·Σ_j A_j²·v_j, PLUS the delta-method β̂ term
    * Dᵀ·I⁻¹·D with D_k = r·Σ_j A_j·(m_jk − dH_j·x_k) and m = −∂dH/∂β
    * (the two sources are asymptotically independent) — every term
    * rides the SAME final-β grid the fit already collected (no extra
    * pass). A (stratum, profile) whose first event
    * exceeds the horizon is S = 1 throughout: rmst = horizon, se = 0.
    * Strata are independent fits — the walk is per-stratum, grid-sized,
    * under the `maxTimes` discipline.
    *
    * @return one row per (stratum, profile): (stratum, profile,
    *         horizon, rmst, se, ci_lo, ci_hi). */
  def rmstAdjusted(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      profiles: Seq[(String, Seq[Double])], horizon: Long,
      iters: Int = 8, maxTimes: Int = 100000,
      strataCol: Option[String] = None, ties: String = "efron",
      firth: Boolean = false, startCol: Option[String] = None,
      tol: Double = 1e-9): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    require(horizon > 0, s"horizon must be positive, got $horizon")
    require(profiles.nonEmpty, "rmstAdjusted needs at least one covariate profile")
    require(profiles.forall(_._2.length == xCols.length),
      s"every profile must supply ${xCols.length} covariate value(s)")
    require(profiles.map(_._1).distinct.size == profiles.size,
      "profile names must be distinct")
    val (beta, cov, _, grid, _) =
      coxFit(subjects, xCols, tCol, eventCol, iters, maxTimes, strataCol, ties,
        firth, startCol, tol)
    val cells = baselineCells(grid, ties == "efron", xCols.length)
    // strata enumerate from the full grid (censor-only strata still get
    // their S = 1 rows), not just from event cells
    val strata = grid.map(_._1).distinct.sorted.toSeq
    val out = strata.flatMap { g =>
      val asc = cells.filter(c => c._1 == g && c._2 <= horizon).sortBy(_._2)
      profiles.map { case (name, x) =>
        val lp = x.zip(beta).map { case (xi, bi) => xi * bi }.sum
        val r = math.exp(lp)
        if (asc.isEmpty) (g, name, horizon, horizon.toDouble, 0.0,
          horizon.toDouble, horizon.toDouble)
        else {
          val (rmst, area) = rmstAreas(asc, horizon, r)
          // suffix tail areas A_j: the Greenwood-type H0 term plus the
          // beta-gradient D_k = r * sum_j A_j * (m_jk - dH_j * x_k) for
          // the delta-method var(beta-hat) term (FIRST-order for any
          // profile off the baseline; the two terms are asymptotically
          // independent)
          val p = xCols.length
          var tail = 0.0
          var sumA2v = 0.0
          val dSum = Array.fill(p)(0.0)
          var j = asc.length - 1
          while (j >= 0) {
            tail += area(j)
            sumA2v += tail * tail * asc(j)._4
            var k = 0
            while (k < p) {
              dSum(k) += tail * (asc(j)._5(k) - asc(j)._3 * x(k))
              k += 1
            }
            j -= 1
          }
          var vb = 0.0
          var k = 0
          while (k < p) {
            var l = 0
            while (l < p) {
              vb += (r * dSum(k)) * cov(k)(l) * (r * dSum(l))
              l += 1
            }
            k += 1
          }
          val se = math.sqrt(r * r * sumA2v + vb)
          (g, name, horizon, rmst, se, rmst - 1.959964 * se, rmst + 1.959964 * se)
        }
      }
    }
    out.toDF("stratum", "profile", "horizon", "rmst", "se", "ci_lo", "ci_hi")
  }

  /** RMST CONTRAST between two covariate profiles with SE and 95% CI —
    * the decision statistic ("how many extra event-free days does treat
    * buy by day τ, and is that distinguishable from zero"). Both arms'
    * curves ride the SAME baseline-hazard increments, so the
    * difference's variance must carry their COVARIANCE:
    * ∂(rmst₁ − rmst₀)/∂dH_j = −(r₁·A_j⁽¹⁾ − r₀·A_j⁽⁰⁾), hence
    * var = Σ_j (r₁A_j⁽¹⁾ − r₀A_j⁽⁰⁾)²·v_j — strictly LESS than the
    * naive per-arm variance sum (the shared baseline noise cancels in
    * the contrast; spec-pinned), which is why differencing the q362
    * rows and root-sum-squaring their SEs would be wrong. Same grid
    * arithmetic, zero extra passes. Returns one row per stratum:
    * (stratum, horizon, rmst_focal, rmst_ref, diff, se, ci_lo,
    * ci_hi). */
  def rmstDiffAdjusted(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      focalProfile: Seq[Double], refProfile: Seq[Double], horizon: Long,
      iters: Int = 8, maxTimes: Int = 100000,
      strataCol: Option[String] = None, ties: String = "efron",
      firth: Boolean = false, startCol: Option[String] = None,
      tol: Double = 1e-9): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    require(horizon > 0, s"horizon must be positive, got $horizon")
    require(focalProfile.length == xCols.length && refProfile.length == xCols.length,
      s"both profiles must supply ${xCols.length} covariate value(s)")
    require(focalProfile != refProfile, "profiles must differ (the contrast is zero)")
    val (beta, cov, _, grid, _) =
      coxFit(subjects, xCols, tCol, eventCol, iters, maxTimes, strataCol, ties,
        firth, startCol, tol)
    val p = xCols.length
    val cells = baselineCells(grid, ties == "efron", p)
    val strata = grid.map(_._1).distinct.sorted.toSeq
    val r1 = math.exp(focalProfile.zip(beta).map { case (xi, bi) => xi * bi }.sum)
    val r0 = math.exp(refProfile.zip(beta).map { case (xi, bi) => xi * bi }.sum)
    val out = strata.map { g =>
      val asc = cells.filter(c => c._1 == g && c._2 <= horizon).sortBy(_._2).toSeq
      if (asc.isEmpty) (g, horizon, horizon.toDouble, horizon.toDouble, 0.0, 0.0, 0.0, 0.0)
      else {
        val (rmst1, a1) = rmstAreas(asc, horizon, r1)
        val (rmst0, a0) = rmstAreas(asc, horizon, r0)
        // contrast gradient: D_k = r1*sum A1(m - dH x1) - r0*sum A0(m - dH x0)
        // — the beta term is FIRST-order for a contrast (the arms differ
        // exactly through beta-hat), which is why the H0-only variance
        // would be dishonestly narrow here
        var t1 = 0.0
        var t0 = 0.0
        var s = 0.0
        val d1 = Array.fill(p)(0.0)
        val d0 = Array.fill(p)(0.0)
        var j = asc.length - 1
        while (j >= 0) {
          t1 += a1(j)
          t0 += a0(j)
          val d = r1 * t1 - r0 * t0
          s += d * d * asc(j)._4
          var k = 0
          while (k < p) {
            d1(k) += t1 * (asc(j)._5(k) - asc(j)._3 * focalProfile(k))
            d0(k) += t0 * (asc(j)._5(k) - asc(j)._3 * refProfile(k))
            k += 1
          }
          j -= 1
        }
        var vb = 0.0
        var k = 0
        while (k < p) {
          var l = 0
          while (l < p) {
            vb += (r1 * d1(k) - r0 * d0(k)) * cov(k)(l) * (r1 * d1(l) - r0 * d0(l))
            l += 1
          }
          k += 1
        }
        val diff = rmst1 - rmst0
        val se = math.sqrt(s + vb)
        (g, horizon, rmst1, rmst0, diff, se, diff - 1.959964 * se, diff + 1.959964 * se)
      }
    }
    out.toDF("stratum", "horizon", "rmst_focal", "rmst_ref", "diff", "se",
      "ci_lo", "ci_hi")
  }

  /** Per-stratum baseline event cells (stratum, t, dH₀ increment, its
    * martingale variance increment v_j, and the β-GRADIENT coefficient
    * m_k = −∂dH_j/∂β_k) from the fit's final-β grid — the shared input
    * of [[rmstAdjusted]] and [[rmstDiffAdjusted]]: Breslow dH = d/S₀,
    * v = d/S₀², m_k = dH·x̄_k; Efron sums within the tie (m_k =
    * Σ_l (S₁_k − (l/d)E₁_k)/S₀ₗ², the exact derivative of its
    * denominator sum). */
  private def baselineCells(
      grid: Array[(String, Long, Long, Double, Double, Array[Double], Array[Double], Array[Double], Array[Double])],
      efron: Boolean, p: Int)
      : scala.collection.mutable.ArrayBuffer[(String, Long, Double, Double, Array[Double])] = {
    val cells =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Double, Array[Double])]
    var stratum: String = null
    var s0 = 0.0
    val s1 = Array.fill(p)(0.0)
    grid.foreach { case (g, t, d, a0, e0, a1, e1, _, _) =>
      if (g != stratum) { stratum = g; s0 = 0.0; java.util.Arrays.fill(s1, 0.0) }
      s0 += a0
      var k = 0
      while (k < p) { s1(k) += a1(k); k += 1 }
      if (d > 0) {
        val (dH, v, m) =
          if (!efron) {
            val dh = d.toDouble / s0
            (dh, d.toDouble / (s0 * s0), Array.tabulate(p)(k2 => dh * (s1(k2) / s0)))
          } else {
            var acc = 0.0
            var accV = 0.0
            val accM = Array.fill(p)(0.0)
            var j = 0L
            while (j < d) {
              val frac = j.toDouble / d
              val s0j = s0 - frac * e0
              acc += 1.0 / s0j
              accV += 1.0 / (s0j * s0j)
              var k2 = 0
              while (k2 < p) {
                accM(k2) += (s1(k2) - frac * e1(k2)) / (s0j * s0j)
                k2 += 1
              }
              j += 1
            }
            (acc, accV, accM)
          }
        cells += ((g, t, dH, v, m))
      }
    }
    cells
  }

  /** One stratum-profile curve at risk score r over the ascending cells
    * `asc` (already horizon-filtered): the step-integral RMST and each
    * cell's step area. */
  private def rmstAreas(
      asc: scala.collection.Seq[(String, Long, Double, Double, Array[Double])],
      horizon: Long, r: Double)
      : (Double, Array[Double]) = {
    val k = asc.length
    var h0 = 0.0
    val area = Array.fill(k)(0.0)
    var j = 0
    while (j < k) {
      h0 += asc(j)._3
      val next = if (j + 1 < k) math.min(asc(j + 1)._2, horizon) else horizon
      area(j) = math.exp(-h0 * r) * (next - asc(j)._2)
      j += 1
    }
    var rmst = math.min(asc(0)._2, horizon).toDouble
    j = 0
    while (j < k) { rmst += area(j); j += 1 }
    (rmst, area)
  }

  /** The shared Newton fit behind [[coxPH]] and [[coxSurvival]]:
    * returns (β̂, I⁻¹ at β̂, n event times, final-β grid rows
    * (stratum, t, d, leaving-mass a0, event-only mass e0) sorted
    * (stratum, t DESC)) — the grid is captured from the SAME final
    * aggregation pass the SE already uses, so exposing it costs
    * nothing. All arithmetic is exactly [[coxPH]]'s pre-r15 body; the
    * q336/q339/q343/q348 oracles replay it term for term. */
  private def coxFit(
      subjects: DataFrame, xCols: Seq[String], tCol: String, eventCol: String,
      iters: Int, maxTimes: Int,
      strataCol: Option[String], ties: String, firth: Boolean,
      startCol: Option[String] = None,
      tol: Double = 1e-9,
      betaStart: Option[Seq[Double]] = None)
      : (Array[Double], Array[Array[Double]], Long,
         Array[(String, Long, Long, Double, Double, Array[Double], Array[Double], Array[Double], Array[Double])],
         Int) = {
    val spark = subjects.sparkSession
    val p = xCols.length
    require(p >= 1, "coxPH needs at least one covariate")
    require(ties == "efron" || ties == "breslow",
      s"ties must be 'efron' or 'breslow', got '$ties'")
    val efron = ties == "efron"
    // COUNTING-PROCESS input (startCol defined): each (start, stop]
    // interval enters the risk set strictly AFTER start and leaves at
    // stop. The descending grid walk already accumulates leaving-mass
    // at stop; entry is the SAME walk with NEGATIVE mass at start
    // (risk set at u = Σ_{stop ≥ u} − Σ_{start ≥ u}: a row whose start
    // equals the event time is NOT yet at risk there) — so the interval
    // form is the plain frame unioned with sign = −1 echoes at the
    // start times, and every downstream formula is untouched. The plain
    // path multiplies by a literal 1.0 (bitwise identity — the
    // q336/q339/q343/q348 oracle replays are unaffected).
    def frame(src: DataFrame, t: org.apache.spark.sql.Column,
        ev: org.apache.spark.sql.Column, sign: Double) =
      src.select(
        strataCol.fold(lit("__all"))(c => col(c).cast("string")).as("g") +:
          t.cast("long").as("t") +:
          ev.cast("int").as("ev") +:
          lit(sign).as("sign") +:
          xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"x$i") }: _*)
    // Interval-validity check rides the FIRST Newton pass as an
    // Observation (the QualityGate zero-extra-job discipline) instead of
    // a separate probe job: the stop-row leg observes the violation
    // count, and the require fires right after the first grid collect —
    // before any result can leave the fit — while costing zero jobs.
    val cpObs = startCol.map(_ =>
      new org.apache.spark.sql.Observation(
        s"cox-cp-validity-${java.util.UUID.randomUUID()}"))
    val subj = (startCol match {
      case None => frame(subjects, col(tCol), col(eventCol), 1.0)
      case Some(sc) =>
        // the observation attaches BELOW the stop-leg projection (which
        // drops the start column), so the observed aggregate still sees it
        val observed = subjects.observe(cpObs.get,
          coalesce(org.apache.spark.sql.functions.sum(
            when(col(sc).cast("long") >= col(tCol).cast("long"), 1L)
              .otherwise(0L)), lit(0L)).as("bad"))
        frame(observed, col(tCol), col(eventCol), 1.0)
          .unionAll(frame(subjects, col(sc), lit(0), -1.0))
    })
      // bound the ITERATED frame's partition count to one per core
      // (scale-adaptive — defaultParallelism, never a constant): the
      // upstream union of shuffle outputs arrives in O(shuffle.partitions)
      // slices, and every Newton pass re-schedules that many tasks over
      // the cache. Measured on q355 (r19, ProfileJobs): each gridAt job
      // ran 194 tasks for ~40k cached rows, 0.55-0.78 s/pass of pure
      // task dispatch — the fit's dominant cost. coalesce is NARROW (no
      // shuffle added); on a cluster it is 1 cached partition per
      // executor core, the standard iterative-ML layout.
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cpChecked = false
    def checkIntervals(): Unit =
      if (!cpChecked) {
        cpChecked = true
        (startCol, cpObs) match {
          case (Some(sc), Some(obs)) =>
            val bad = obs.get("bad").asInstanceOf[Long]
            require(bad == 0,
              s"counting-process intervals need $sc < $tCol on every row — " +
                s"$bad rows violate it; zero-length intervals carry no risk time")
          case _ => ()
        }
      }
    try {
      val pairs = (for { k <- 0 until p; l <- k until p } yield (k, l)).toArray
      // symmetric flat indices: pIdx(k)(l) into `pairs`; tIdx(k)(l)(m)
      // into `triples` (third moments, Firth only)
      val pIdx = Array.fill(p, p)(0)
      pairs.zipWithIndex.foreach { case ((k, l), i) => pIdx(k)(l) = i; pIdx(l)(k) = i }
      val triples =
        (for { k <- 0 until p; l <- k until p; m <- l until p } yield (k, l, m)).toArray
      val tIdx = Array.fill(p, p, p)(0)
      triples.zipWithIndex.foreach { case ((k, l, m), i) =>
        Seq((k, l, m), (k, m, l), (l, k, m), (l, m, k), (m, k, l), (m, l, k))
          .foreach { case (x, y, z) => tIdx(x)(y)(z) = i }
      }
      // one aggregation pass at the current β: per (stratum, observed
      // time), the event sums, the e^{βᵀx}-weighted leaving-mass moments
      // (a*), the event-only weighted moments (e*) Efron's within-tie
      // subtraction needs, and — Firth only — the third weighted moments
      // (a3/e3) the penalty's ∂I/∂β needs: all in the SAME hash aggregate
      final case class Cell(
          g: String, t: Long, d: Long, sx: Array[Double],
          a0: Double, a1: Array[Double], a2: Array[Double],
          e0: Double, e1: Array[Double], e2: Array[Double],
          a3: Array[Double], e3: Array[Double])
      def gridAt(beta: Array[Double]): Array[Cell] = {
        val wExpr = exp((0 until p).map(i => col(s"x$i") * lit(beta(i)))
          .reduce(_ + _))
        // sw = sign·w: the counting-process entry echoes subtract; the
        // plain path multiplies by literal 1.0 (bitwise identity). Event
        // sums stay on w — events live only on sign=+1 stop rows.
        val evW = when(col("ev") === 1, col("w")).otherwise(lit(0.0))
        val aggs =
          sum(col("ev")).cast("long").as("d") +: (
            (0 until p).map(k =>
              sum(when(col("ev") === 1, col(s"x$k")).otherwise(lit(0.0))).as(s"sx$k")) ++
            Seq(sum(col("sw")).as("a0")) ++
            (0 until p).map(k => sum(col(s"x$k") * col("sw")).as(s"a1_$k")) ++
            pairs.toSeq.map { case (k, l) =>
              sum(col(s"x$k") * col(s"x$l") * col("sw")).as(s"a2_${k}_$l")
            } ++
            Seq(sum(evW).as("e0")) ++
            (0 until p).map(k => sum(col(s"x$k") * evW).as(s"e1_$k")) ++
            pairs.toSeq.map { case (k, l) =>
              sum(col(s"x$k") * col(s"x$l") * evW).as(s"e2_${k}_$l")
            } ++
            (if (!firth) Seq.empty
             else triples.toSeq.map { case (k, l, m) =>
               sum(col(s"x$k") * col(s"x$l") * col(s"x$m") * col("sw"))
                 .as(s"a3_${k}_${l}_$m")
             } ++ triples.toSeq.map { case (k, l, m) =>
               sum(col(s"x$k") * col(s"x$l") * col(s"x$m") * evW)
                 .as(s"e3_${k}_${l}_$m")
             }))
        // `.limit(maxTimes + 1)` puts the declared-judgement cap IN the
        // plan: a pathological (microsecond-granular) grid refuses after
        // the driver has received maxTimes + 1 rows, never the full grid
        val rows = subj.withColumn("w", wExpr)
          .withColumn("sw", col("sign") * col("w"))
          .groupBy("g", "t").agg(aggs.head, aggs.tail: _*)
          .limit(maxTimes + 1)
          .collect()
        checkIntervals() // first pass materialized subj: the observed
                         // validity count is now available, zero jobs
        require(rows.length <= maxTimes,
          s"cox grid has ${rows.length} (stratum, time) cells > maxTimes=$maxTimes — " +
            "the driver solve is bounded by declared judgement; coarsen the duration " +
            "unit or raise the cap knowingly")
        val q = pairs.length
        val r3 = triples.length
        rows.map { r =>
          Cell(r.getString(0), r.getLong(1), r.getLong(2),
            Array.tabulate(p)(k => r.getDouble(3 + k)),
            r.getDouble(3 + p),
            Array.tabulate(p)(k => r.getDouble(4 + p + k)),
            Array.tabulate(q)(i => r.getDouble(4 + 2 * p + i)),
            r.getDouble(4 + 2 * p + q),
            Array.tabulate(p)(k => r.getDouble(5 + 2 * p + q + k)),
            Array.tabulate(q)(i => r.getDouble(5 + 3 * p + q + i)),
            if (!firth) Array.emptyDoubleArray
            else Array.tabulate(r3)(i => r.getDouble(5 + 3 * p + 2 * q + i)),
            if (!firth) Array.emptyDoubleArray
            else Array.tabulate(r3)(i => r.getDouble(5 + 3 * p + 2 * q + r3 + i)))
        }.sortBy(c => (c.g, -c.t))
        // within each stratum, descending time: the running cumulative IS
        // that stratum's risk-set sum (risk sets never cross strata)
      }
      // score U and information I at β from one grid pass — plus, when
      // Firth is on, the penalty's ∂I/∂β_m tensor (the risk-set
      // distribution's third CENTRAL moments). Driver cost: Breslow
      // touches each event TIME once; Efron's inner j-loop totals
      // Σ_t d_t = total events per pass — arithmetic, not memory.
      def scoreInfo(grid: Array[Cell])
          : (Array[Double], Array[Array[Double]], Array[Array[Array[Double]]], Long) = {
        val u = Array.fill(p)(0.0)
        val inf = Array.fill(p, p)(0.0)
        val dInf = if (firth) Array.fill(p, p, p)(0.0) else Array.empty[Array[Array[Double]]]
        var s0 = 0.0
        val s1 = Array.fill(p)(0.0)
        val s2 = Array.fill(pairs.length)(0.0)
        val s3 = Array.fill(triples.length)(0.0)
        var nTimes = 0L
        var stratum: String = null
        // ∂I_kl/∂β_m of a weighted risk-set distribution with raw moments
        // μ1/μ2/μ3 (all scaled by the same z0): the third central moment
        // μ3_klm − μ2_kl·μ1_m − μ2_km·μ1_l − μ2_lm·μ1_k + 2·μ1_k·μ1_l·μ1_m
        def addCentral3(
            z0: Double, z1: Int => Double, z2: Array[Double], z3: Array[Double],
            scale: Double): Unit = {
          var ii = 0
          while (ii < pairs.length) {
            val (k1, l1) = pairs(ii)
            var m = 0
            while (m < p) {
              val c3 = z3(tIdx(k1)(l1)(m)) / z0 -
                (z2(pIdx(k1)(l1)) / z0) * (z1(m) / z0) -
                (z2(pIdx(k1)(m)) / z0) * (z1(l1) / z0) -
                (z2(pIdx(l1)(m)) / z0) * (z1(k1) / z0) +
                2.0 * (z1(k1) / z0) * (z1(l1) / z0) * (z1(m) / z0)
              dInf(m)(k1)(l1) += scale * c3
              if (k1 != l1) dInf(m)(l1)(k1) += scale * c3
              m += 1
            }
            ii += 1
          }
        }
        grid.foreach { c =>
          if (c.g != stratum) { // new stratum: fresh risk-set accumulators
            stratum = c.g
            s0 = 0.0
            java.util.Arrays.fill(s1, 0.0)
            java.util.Arrays.fill(s2, 0.0)
            java.util.Arrays.fill(s3, 0.0)
          }
          s0 += c.a0
          var k = 0; while (k < p) { s1(k) += c.a1(k); k += 1 }
          var i = 0; while (i < pairs.length) { s2(i) += c.a2(i); i += 1 }
          if (firth) {
            var i3 = 0; while (i3 < triples.length) { s3(i3) += c.a3(i3); i3 += 1 }
          }
          val d = c.d
          if (d > 0) {
            nTimes += 1
            if (!efron) {
              // Breslow closed form (kept verbatim: q336/q339's oracle
              // replays match this arithmetic term-for-term)
              var kk = 0
              while (kk < p) { u(kk) += c.sx(kk) - d * s1(kk) / s0; kk += 1 }
              var ii = 0
              while (ii < pairs.length) {
                val (k1, l1) = pairs(ii)
                val v = d * (s2(ii) / s0 - s1(k1) * s1(l1) / (s0 * s0))
                inf(k1)(l1) += v
                if (k1 != l1) inf(l1)(k1) += v
                ii += 1
              }
              if (firth) addCentral3(s0, s1(_), s2, s3, d.toDouble)
            } else {
              // Efron: the j-th of d tied events sees the risk set with
              // j/d of the tied events' own e^{βᵀx} mass removed
              var kk = 0
              while (kk < p) { u(kk) += c.sx(kk); kk += 1 }
              var j = 0L
              while (j < d) {
                val frac = j.toDouble / d
                val s0j = s0 - frac * c.e0
                kk = 0
                while (kk < p) { u(kk) -= (s1(kk) - frac * c.e1(kk)) / s0j; kk += 1 }
                var ii = 0
                while (ii < pairs.length) {
                  val (k1, l1) = pairs(ii)
                  val s1k = s1(k1) - frac * c.e1(k1)
                  val s1l = s1(l1) - frac * c.e1(l1)
                  val v = (s2(ii) - frac * c.e2(ii)) / s0j - s1k * s1l / (s0j * s0j)
                  inf(k1)(l1) += v
                  if (k1 != l1) inf(l1)(k1) += v
                  ii += 1
                }
                if (firth) {
                  // the adjusted sums s* = s − frac·e differentiate to the
                  // adjusted third moments (d/dβ_m of each w is x_m·w)
                  val s2j = Array.tabulate(pairs.length)(i2 => s2(i2) - frac * c.e2(i2))
                  val s3j = Array.tabulate(triples.length)(i3 => s3(i3) - frac * c.e3(i3))
                  addCentral3(s0j, k2 => s1(k2) - frac * c.e1(k2), s2j, s3j, 1.0)
                }
                j += 1
              }
            }
          }
        }
        (u, inf, dInf, nTimes)
      }
      // driver-side p×p solve: Gaussian elimination with partial
      // pivoting (p is the covariate count — single digits)
      def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
        val n = b0.length
        val a = a0.map(_.clone()); val b = b0.clone()
        var c = 0
        while (c < n) {
          var piv = c
          var r = c + 1
          while (r < n) { if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r; r += 1 }
          require(math.abs(a(piv)(c)) > 1e-300,
            "singular information matrix — collinear covariates?")
          val tmp = a(c); a(c) = a(piv); a(piv) = tmp
          val tb = b(c); b(c) = b(piv); b(piv) = tb
          var r2 = c + 1
          while (r2 < n) {
            val m = a(r2)(c) / a(c)(c)
            var cc = c
            while (cc < n) { a(r2)(cc) -= m * a(c)(cc); cc += 1 }
            b(r2) -= m * b(c)
            r2 += 1
          }
          c += 1
        }
        val x = Array.fill(n)(0.0)
        var r3 = n - 1
        while (r3 >= 0) {
          var s = b(r3)
          var cc = r3 + 1
          while (cc < n) { s -= a(r3)(cc) * x(cc); cc += 1 }
          x(r3) = s / a(r3)(r3)
          r3 -= 1
        }
        x
      }
      def inverse(a: Array[Array[Double]]): Array[Array[Double]] = {
        val n = a.length
        val cols = (0 until n).map { j =>
          solve(a, Array.tabulate(n)(i => if (i == j) 1.0 else 0.0))
        }
        Array.tabulate(n, n)((i, j) => cols(j)(i))
      }
      // warm start (betaStart): the previous fit's β̂ as the Newton
      // init — the stationary point is start-independent, only the pass
      // count changes (spec-pinned)
      val beta = betaStart match {
        case None => Array.fill(p)(0.0)
        case Some(b0) =>
          require(b0.length == p,
            s"betaStart has ${b0.length} entries for ${p} covariate(s)")
          require(b0.forall(java.lang.Double.isFinite),
            "betaStart must be finite — a refused (separated) fit is not a prior")
          b0.toArray
      }
      def refuseSeparation(maxStep: Double): Nothing = {
        val worst = (0 until p).maxBy(k => math.abs(beta(k)))
        val firthHint =
          if (firth) "the FIRTH-penalized fit still stepping after the fixed " +
            "iterations is genuine non-convergence — raise `iters`"
          else "Remove, coarsen, or bound the covariate, or refit with " +
            "`firth = true`; a Wald CI is meaningless under separation"
        throw new IllegalArgumentException(
          s"cox Newton did not converge in $iters iterations " +
            f"(final |Δβ| = $maxStep%.3g; β = ${beta.map(b => f"$b%.3f").mkString(", ")}): " +
            s"monotone partial likelihood — covariate '${xCols(worst)}' " +
            "(the largest |β|) likely separates the event order perfectly, so its " +
            "MLE is infinite and any fixed-iteration estimate is an artifact of the " +
            s"cutoff. $firthHint")
      }
      // Firth-modified score: U*_k = U_k + ½·tr(I⁻¹·∂I/∂β_k)
      def effScore(u: Array[Double], inf: Array[Array[Double]],
          dInf: Array[Array[Array[Double]]]): Array[Double] =
        if (!firth) u
        else {
          val invI = inverse(inf)
          Array.tabulate(p) { k =>
            var tr = 0.0
            var a = 0
            while (a < p) {
              var b = 0
              while (b < p) { tr += invI(a)(b) * dInf(k)(b)(a); b += 1 }
              a += 1
            }
            u(k) + 0.5 * tr
          }
        }
      // CONVERGENCE-BOUNDED Newton: `iters` is a CAP, not a fixed count.
      // The per-pass gradient is already on the driver, so the stopping
      // check is free; quadratic convergence means a step ≤ tol·(1+‖β‖∞)
      // leaves the NEXT step at O(tol²) — the early-exit β̂ and the
      // run-to-cap β̂ agree far beyond the oracles' 6-decimal rounding
      // (the Cox-family DuckDB replays stay byte-identical; spec-pinned).
      // Each SKIPPED pass is one full hash aggregation over the subject
      // frame — at 100× data that is the entire point. tol = 0 disables
      // the exit (the job-count spec uses it as the fixed-count control).
      var itersUsed = 0
      var converged = false
      while (itersUsed < iters && !converged) {
        val (u, inf, dInf, _) = scoreInfo(gridAt(beta))
        val step = solve(inf, effScore(u, inf, dInf))
        var k = 0; while (k < p) { beta(k) += step(k); k += 1 }
        itersUsed += 1
        // a non-finite iterate means exp(βᵀx) already over/underflowed —
        // refuse NOW, before the next grid pass turns it into NaN soup
        if (!beta.forall(java.lang.Double.isFinite)) refuseSeparation(Double.PositiveInfinity)
        converged = step.map(math.abs).max <= tol * (1.0 + beta.map(math.abs).max)
      }
      // SE and Wald from the information AT the final β (what an oracle
      // replay computes), not at the last pre-update point. The same pass
      // yields the would-be NEXT step: a quadratically-convergent fit has
      // landed at machine precision by now, so a step still moving is the
      // separation signature (or, under Firth, true non-convergence), not
      // slow convergence.
      val gridFinal = gridAt(beta)
      val (uFinal, infFinal, dInfFinal, nTimes) = scoreInfo(gridFinal)
      val finalStep = solve(infFinal, effScore(uFinal, infFinal, dInfFinal))
        .map(math.abs).max
      if (finalStep > 1e-6 * (1.0 + beta.map(math.abs).max)) refuseSeparation(finalStep)
      val cov = inverse(infFinal)
      (beta, cov, nTimes,
        gridFinal.map(c => (c.g, c.t, c.d, c.a0, c.e0, c.a1, c.e1, c.a2, c.sx)),
        itersUsed)
    } finally subj.unpersist()
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
