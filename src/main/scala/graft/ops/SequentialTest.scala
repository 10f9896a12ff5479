package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-sequential A/B monitoring — the "peek every day without lying
  * to yourself" machinery (Pocock 1977, O'Brien & Fleming 1979): a
  * running two-proportion z statistic per look day, compared against the
  * O'Brien-Fleming-shaped boundary b_k = z_α/2 · √(K/k) for look k of K
  * — very conservative early (when the statistic is noisy and peeking is
  * most tempting), relaxing to the nominal critical value at the final
  * look. A fixed-horizon test evaluated daily inflates false positives
  * several-fold; the boundary sequence is what makes daily monitoring
  * honest.
  *
  * Scale shape: subjects arrive as one row each (arm, entry day,
  * conversion day) — the upstream keyed aggregation owns the data-sized
  * work. This op aggregates them onto the LOOK GRID (the observation
  * calendar, bounded by design) and runs cumulative windows + the z/
  * boundary arithmetic over that grid ([[graft.core.Windows]]
  * discipline: per-arm windows over a calendar-bounded input).
  *
  * Contract: `looks` must cover every entry and conversion day (pass the
  * observation calendar) — a day missing from it would silently drop its
  * counts from every later look. */
object SequentialTest {

  /** One row per qualifying look (both arms ≥ `minPerArm` subjects):
    * (day, k, n_a, conv_a, n_b, conv_b, z, boundary, crossed) where
    * arm `focal` is the A side. `z` is the pooled two-proportion
    * statistic of cumulative conversion at the look; `crossed` is
    * |z| > boundary. k/K count qualifying looks only (looks before
    * `minPerArm` are previews, not tests — spending alpha on them would
    * be wasted on unstable denominators). */
  def obfMonitor(
      subjects: DataFrame, armCol: String, entryCol: String, convCol: String,
      looks: DataFrame, lookCol: String, focal: String,
      zAlpha: Double = 1.96, minPerArm: Long = 30L): DataFrame = {
    val arm = col(armCol).cast("string")
    val ent = subjects.groupBy(arm.as("arm"), col(entryCol).as("day"))
      .agg(count(lit(1)).as("en"))
    val cv = subjects.filter(col(convCol).isNotNull)
      .groupBy(arm.as("arm"), col(convCol).as("day"))
      .agg(count(lit(1)).as("cn"))
    val arms = subjects.select(arm.as("arm")).distinct()
    // Two-arm contract enforced, not assumed: the B side below is "every
    // non-focal arm", so a third arm would join one row PER ARM per look
    // day, duplicating days and making k/bigk (row_number over day)
    // ambiguous. limit(3) bounds the check collect at three rows.
    val armVals = arms.limit(3).collect().map(_.getString(0)).toSeq
    require(armVals.size == 2,
      s"obfMonitor is a two-arm test; found arms ${armVals.sorted.mkString(", ")}" +
        (if (armVals.size == 3) " (and possibly more)" else ""))
    require(armVals.contains(focal),
      s"focal arm '$focal' not present; arms are ${armVals.sorted.mkString(", ")}")
    val grid = looks.select(col(lookCol).as("day")).distinct()
      .crossJoin(broadcast(arms)) // calendar × arm count
      .join(ent, Seq("arm", "day"), "left")
      .join(cv, Seq("arm", "day"), "left")
      .select(
        col("arm"), col("day"),
        coalesce(col("en"), lit(0L)).as("en"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    val byArm = Window.partitionBy("arm").orderBy("day")
    val cum = grid
      .withColumn("n", sum("en").over(byArm))
      .withColumn("c", sum("cn").over(byArm))
    val a = cum.filter(col("arm") === focal)
      .select(col("day"), col("n").as("n_a"), col("c").as("conv_a"))
    val b = cum.filter(col("arm") =!= focal)
      .select(col("day"), col("n").as("n_b"), col("c").as("conv_b"))
    val qualifying = a.join(b, "day")
      .filter(col("n_a") >= minPerArm && col("n_b") >= minPerArm)
    // k/K over the qualifying look grid (calendar-bounded single task —
    // the Windows.bounded judgement; kept as explicit Window.orderBy
    // inside the op so the boundary math reads in one place)
    val lookW = graft.core.Windows.bounded(col("day"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pPool = (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b"))
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    qualifying
      .withColumn("k", row_number().over(lookW).cast("long"))
      .withColumn("bigk", count(lit(1)).over(
        lookW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("z", when(se > 0.0, (pa - pb) / se).otherwise(lit(0.0)))
      .withColumn("boundary",
        lit(zAlpha) * sqrt(col("bigk").cast("double") / col("k")))
      .withColumn("crossed", abs(col("z")) > col("boundary"))
      .select("day", "k", "n_a", "conv_a", "n_b", "conv_b", "z", "boundary", "crossed")
  }

  /** Always-valid p-values over an [[obfMonitor]] grid — the mixture
    * SPRT (Johari, Pekelis & Walsh 2017, "Peeking at A/B tests"): the
    * mixture likelihood ratio for the cumulative conversion difference
    * Δ_k with estimated variance V_k,
    *   Λ_k = √(V/(V+τ²)) · exp(Δ²τ²/(2·V·(V+τ²))),
    * gives p_k = min(1, min_{j≤k} 1/Λ_j) — a p-value that stays valid
    * UNDER CONTINUOUS MONITORING with no pre-declared number of looks,
    * the property the OBF boundary buys only for a fixed look schedule.
    * Nonincreasing by construction (the running min), so a dashboard
    * can ship it directly. τ is the mixture scale: the effect-size
    * magnitude the test is most sensitive to (default 0.1 ≈ ten-point
    * conversion lifts).
    *
    * Same scale shape as the monitor: arithmetic over the qualifying
    * look grid plus one more bounded running-max window. Carried in LOG
    * form (`log_lambda`): Λ itself overflows rounding comparability once
    * the exponent grows (e^50-scale values round at ulp granularity, not
    * 1e-6), while ln Λ stays modest and p = min(1, e^{−max ln Λ}) stays
    * in [0,1] — both deterministically comparable across engines.
    * Degenerate V = 0 looks (both arms all- or never-converted) carry
    * ln Λ = 0. */
  def alwaysValidP(monitor: DataFrame, tau: Double = 0.1): DataFrame = {
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val v = pa * (lit(1.0) - pa) / col("n_a") + pb * (lit(1.0) - pb) / col("n_b")
    val logLambda = mSprtLogLambda(pa - pb, v, tau)
    val runMax = graft.core.Windows.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monitor
      .withColumn("log_lambda", logLambda)
      .withColumn("p_always_valid",
        least(lit(1.0), exp(-max(col("log_lambda")).over(runMax))))
  }

  /** The CONTINUOUS-metric look grid — [[obfMonitor]]'s cumulative
    * machinery for a per-subject VALUE (revenue, activity, a
    * CUPED-adjusted metric) instead of a conversion flag: one row per
    * qualifying look day carrying each arm's cumulative count, sum and
    * sum of squares. Moments, not means, cross the grid — they are the
    * associative facts; every downstream statistic (Welch variance,
    * mixture SPRT) derives from them in one place, and a streaming fold
    * can carry the identical triple exactly.
    *
    * Same scale shape as [[obfMonitor]]: one keyed aggregation of
    * subjects onto (arm, day), then cumulative windows over the
    * calendar-bounded look grid. */
  def meanMonitor(
      subjects: DataFrame, armCol: String, dayCol: String, valueCol: String,
      looks: DataFrame, lookCol: String, focal: String,
      minPerArm: Long = 30L): DataFrame = {
    val arm = col(armCol).cast("string")
    val v = col(valueCol).cast("double")
    val daily = subjects.groupBy(arm.as("arm"), col(dayCol).as("day"))
      .agg(count(lit(1)).as("en"), sum(v).as("sv"), sum(v * v).as("svv"))
    val arms = subjects.select(arm.as("arm")).distinct()
    val armVals = arms.limit(3).collect().map(_.getString(0)).toSeq
    require(armVals.size == 2,
      s"meanMonitor is a two-arm test; found arms ${armVals.sorted.mkString(", ")}" +
        (if (armVals.size == 3) " (and possibly more)" else ""))
    require(armVals.contains(focal),
      s"focal arm '$focal' not present; arms are ${armVals.sorted.mkString(", ")}")
    val grid = looks.select(col(lookCol).as("day")).distinct()
      .crossJoin(broadcast(arms))
      .join(daily, Seq("arm", "day"), "left")
      .select(col("arm"), col("day"),
        coalesce(col("en"), lit(0L)).as("en"),
        coalesce(col("sv"), lit(0.0)).as("sv"),
        coalesce(col("svv"), lit(0.0)).as("svv"))
    val byArm = Window.partitionBy("arm").orderBy("day")
    val cum = grid
      .withColumn("n", sum("en").over(byArm))
      .withColumn("s", sum("sv").over(byArm))
      .withColumn("ss", sum("svv").over(byArm))
    val a = cum.filter(col("arm") === focal)
      .select(col("day"), col("n").as("n_a"), col("s").as("sum_a"), col("ss").as("ssq_a"))
    val b = cum.filter(col("arm") =!= focal)
      .select(col("day"), col("n").as("n_b"), col("s").as("sum_b"), col("ss").as("ssq_b"))
    val lookW = graft.core.Windows.bounded(col("day"))
    a.join(b, "day")
      // ≥2 per arm is the hard floor (a sample variance needs it);
      // minPerArm is the caller's preview cut, same role as obfMonitor's
      .filter(col("n_a") >= greatest(lit(minPerArm), lit(2L)) &&
        col("n_b") >= greatest(lit(minPerArm), lit(2L)))
      .withColumn("k", row_number().over(lookW).cast("long"))
      .select("day", "k", "n_a", "sum_a", "ssq_a", "n_b", "sum_b", "ssq_b")
  }

  /** Always-valid p over a [[meanMonitor]] grid — the same mixture SPRT
    * as [[alwaysValidP]] with the mean difference in Δ's seat and the
    * Welch variance in V's:
    *   Δ = x̄_a − x̄_b,  V = s²_a/n_a + s²_b/n_b  (sample variances from
    * the cumulative moments), Λ = √(V/(V+τ²))·exp(Δ²τ²/(2V(V+τ²))),
    * p = min(1, e^{−max_{j≤k} ln Λ_j}). The formula is the normal-mean
    * mSPRT — exactly what a revenue/engagement dashboard needs where
    * [[alwaysValidP]] serves conversion rates. τ now lives on the
    * METRIC's scale (pick ~ the effect size that matters, e.g. 0.5
    * events); the conversion default 0.1 is NOT a sensible default
    * here, so τ is required.
    *
    * Degenerate V = 0 looks (both arms constant so far) carry ln Λ = 0
    * — no evidence either way, same policy as the conversion path. */
  def alwaysValidPMean(monitor: DataFrame, tau: Double): DataFrame = {
    require(tau > 0, s"tau must be positive (the mixture scale), got $tau")
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ma = col("sum_a") / na
    val mb = col("sum_b") / nb
    val logLambda = meanLogLambda(
      na, col("sum_a"), col("ssq_a"), nb, col("sum_b"), col("ssq_b"), tau)
    val runMax = graft.core.Windows.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monitor
      .withColumn("mean_a", ma).withColumn("mean_b", mb)
      .withColumn("log_lambda", logLambda)
      .withColumn("p_always_valid",
        least(lit(1.0), exp(-max(col("log_lambda")).over(runMax))))
  }

  /** CUPED-adjusted always-valid p over a monitor grid carrying UNIT
    * x-moments beside the y-moments — (n, Σy, Σy², Σx, Σx², Σxy) per
    * side, whatever the unit: clusters from
    * [[clusterMeanMonitor]]`(xCol = …)` (the unit value is the cluster
    * MEAN, so this is the variance-reduced CLUSTER-level monitor the
    * fixed-horizon clustered CUPED readout was missing a sequential
    * twin for). At every look: the pair-pooled θ from the CUMULATIVE
    * unit moments (the running-θ policy of [[MultiArm.sequential]] and
    * the streaming scorecard fold — with one-subject clusters this
    * reproduces `MultiArm.sequential`'s adjusted columns exactly,
    * spec-pinned), the adjusted lift Δ' = Δ_y − θ·Δ_x, its Welch
    * variance from the θ-adjusted sample variances, and the normal-mean
    * mixture SPRT ([[mSprtLogLambda]], by call) with the running-max
    * fold. A constant covariate gives θ = 0 and the adjusted columns
    * degrade to [[alwaysValidPMean]]'s raw ones (spec-pinned). */
  def alwaysValidPMeanCuped(monitor: DataFrame, tau: Double): DataFrame = {
    require(tau > 0, s"tau must be positive (the mixture scale), got $tau")
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val (theta, deltaC, vC) = cupedContrast(
      na, col("sum_a"), col("ssq_a"), col("sx_a"), col("sxx_a"), col("sxy_a"),
      nb, col("sum_b"), col("ssq_b"), col("sx_b"), col("sxx_b"), col("sxy_b"))
    val runMax = graft.core.Windows.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monitor
      .withColumn("mean_a", col("sum_a") / na)
      .withColumn("mean_b", col("sum_b") / nb)
      .withColumn("theta", theta)
      .withColumn("delta_cuped", deltaC)
      .withColumn("se_cuped", when(vC > 0.0, sqrt(vC)).otherwise(lit(0.0)))
      .withColumn("log_lambda_cuped", mSprtLogLambda(deltaC, vC, tau))
      .withColumn("p_always_valid_cuped",
        least(lit(1.0), exp(-max(col("log_lambda_cuped")).over(runMax))))
  }

  /** The pair-pooled CUPED contrast from per-side cumulative UNIT
    * moments — (θ, adjusted Δ, adjusted Welch V), the algebra of
    * [[MultiArm.report]]/[[MultiArm.sequential]] as reusable columns:
    * θ regresses y on x over the POOLED pair's units, each side's
    * variance is the θ-adjusted sample variance, V is their Welch sum.
    * One home so the subject-level and cluster-level CUPED monitors
    * cannot drift. */
  private[graft] def cupedContrast(
      na: Column, sa: Column, ssa: Column, sxa: Column, sxxa: Column, sxya: Column,
      nb: Column, sb: Column, ssb: Column, sxb: Column, sxxb: Column, sxyb: Column)
      : (Column, Column, Column) = {
    val nn = na + nb
    val sxP = sxa + sxb
    val syP = sa + sb
    val varXn = (sxxa + sxxb) - sxP * sxP / nn
    val theta = when(varXn > 0.0,
      ((sxya + sxyb) - sxP * syP / nn) / varXn).otherwise(lit(0.0))
    def adjVar(ss: Column, s: Column, sxx: Column, sx: Column,
        sxy: Column, n: Column): Column = {
      val vy = (ss - s * s / n) / (n - lit(1.0))
      val vx = (sxx - sx * sx / n) / (n - lit(1.0))
      val cxy = (sxy - sx * s / n) / (n - lit(1.0))
      vy - lit(2.0) * theta * cxy + theta * theta * vx
    }
    val mx = sxP / nn
    val deltaC = (sa / na - theta * (sxa / na - mx)) -
      (sb / nb - theta * (sxb / nb - mx))
    val vC = adjVar(ssa, sa, sxxa, sxa, sxya, na) / na +
      adjVar(ssb, sb, sxxb, sxb, sxyb, nb) / nb
    (theta, deltaC, vC)
  }

  /** CLUSTER-randomized continuous monitoring — [[meanMonitor]]'s
    * honest counterpart when assignment happens ABOVE the subject
    * (geos, stores): the unit of sequential analysis is the CLUSTER
    * MEAN, because subject-level variance understates V under
    * within-cluster correlation and an mSPRT fed the iid V peeks
    * anyway. One row per qualifying look day carrying each arm's
    * cluster count and the sum / sum-of-squares of the CUMULATIVE
    * cluster means — named (n_a, sum_a, ssq_a, …) so
    * [[alwaysValidPMean]] applies verbatim (Δ = difference of unweighted
    * cluster-mean averages, V = sample variance of cluster means over
    * clusters — the cluster-level normal-mean mSPRT). A cluster seen in
    * BOTH arms cumulatively by a look is an assignment defect: excluded
    * from both sides and counted in `mixed_m` (the dead-letter
    * discipline — the defect is reported, not silently averaged in).
    *
    * Scale shape: one keyed aggregation of subjects onto (cluster, day)
    * — the only data-sized pass — then cumulative windows over the
    * clusters × calendar grid (clusters are design-sized: the same
    * O(windows × clusters) bound the streaming scorecard's state
    * carries) and one groupBy(day) over it. Shared by call with the
    * streaming clustered scorecard's commit-time fold
    * ([[clusterLookStats]]), so batch and stream cannot drift. */
  def clusterMeanMonitor(
      subjects: DataFrame, armCol: String, dayCol: String, valueCol: String,
      clusterCol: String, looks: DataFrame, lookCol: String, focal: String,
      control: String, minClusters: Long = 2L,
      xCol: Option[String] = None): DataFrame = {
    val arm = col(armCol).cast("string")
    val v = col(valueCol).cast("double")
    val x = xCol.map(c => col(c).cast("double")).getOrElse(lit(0.0))
    val isF = arm === focal
    val isC = arm === control
    val xAggs =
      if (xCol.isEmpty) Seq.empty
      else Seq(
        sum(when(isF, x).otherwise(lit(0.0))).as("dsx_f"),
        sum(when(isC, x).otherwise(lit(0.0))).as("dsx_c"))
    val aggs = Seq(
      sum(when(isF, 1L).otherwise(0L)).as("dn_f"),
      sum(when(isF, v).otherwise(lit(0.0))).as("dsy_f"),
      sum(when(isC, 1L).otherwise(0L)).as("dn_c"),
      sum(when(isC, v).otherwise(lit(0.0))).as("dsy_c")) ++ xAggs
    val daily = subjects
      .groupBy(col(clusterCol).cast("string").as("cluster"),
        col(dayCol).as("day"))
      .agg(aggs.head, aggs.tail: _*)
    val clusters = subjects.select(col(clusterCol).cast("string").as("cluster"))
      .distinct()
    val xSel =
      if (xCol.isEmpty) Seq.empty
      else Seq(
        coalesce(col("dsx_f"), lit(0.0)).as("dsx_f"),
        coalesce(col("dsx_c"), lit(0.0)).as("dsx_c"))
    val grid = looks.select(col(lookCol).as("day")).distinct()
      .crossJoin(clusters) // calendar × design-sized cluster set
      .join(daily, Seq("cluster", "day"), "left")
      .select(Seq(col("cluster"), col("day"),
        coalesce(col("dn_f"), lit(0L)).as("dn_f"),
        coalesce(col("dsy_f"), lit(0.0)).as("dsy_f"),
        coalesce(col("dn_c"), lit(0L)).as("dn_c"),
        coalesce(col("dsy_c"), lit(0.0)).as("dsy_c")) ++ xSel: _*)
    val byCl = Window.partitionBy("cluster").orderBy("day")
    val cum0 = grid
      .withColumn("n_f", sum("dn_f").over(byCl))
      .withColumn("sy_f", sum("dsy_f").over(byCl))
      .withColumn("n_c", sum("dn_c").over(byCl))
      .withColumn("sy_c", sum("dsy_c").over(byCl))
    val cum =
      if (xCol.isEmpty)
        cum0.select("cluster", "day", "n_f", "sy_f", "n_c", "sy_c")
      else cum0
        .withColumn("sx_f", sum("dsx_f").over(byCl))
        .withColumn("sx_c", sum("dsx_c").over(byCl))
        .select("cluster", "day", "n_f", "sy_f", "n_c", "sy_c", "sx_f", "sx_c")
    val floor = math.max(minClusters, 2L)
    val lookW = graft.core.Windows.bounded(col("day"))
    val keep = Seq("day", "k", "n_a", "sum_a", "ssq_a", "n_b", "sum_b", "ssq_b") ++
      (if (xCol.isEmpty) Seq.empty
       else Seq("sx_a", "sxx_a", "sxy_a", "sx_b", "sxx_b", "sxy_b")) ++
      Seq("mixed_m")
    clusterLookStats(cum)
      .filter(col("n_a") >= floor && col("n_b") >= floor)
      .withColumn("k", row_number().over(lookW).cast("long"))
      .select(keep.map(col): _*)
  }

  /** The per-look CLUSTER-MEAN moments — the one home for "which
    * clusters count and what crosses the look" shared by
    * [[clusterMeanMonitor]] (batch) and the streaming clustered
    * scorecard's commit-time fold: input is CUMULATIVE per-(cluster,
    * day) sums (day, cluster, n_f, sy_f, n_c, sy_c), output one row per
    * day with n_a/n_b = pure-arm cluster counts, sum/ssq = moments of
    * the cluster means, and mixed_m = clusters seen in both arms
    * cumulatively (excluded from both sides). */
  private[graft] def clusterLookStats(cum: DataFrame): DataFrame = {
    val pureF = col("n_f") > 0 && col("n_c") === 0
    val pureC = col("n_c") > 0 && col("n_f") === 0
    val meanF = col("sy_f") / col("n_f")
    val meanC = col("sy_c") / col("n_c")
    // COVARIATE cluster means ride when the cum frame carries the x
    // sums — the CUPED leg's unit facts (moments of mx and mx·my over
    // clusters, same unit as the y moments)
    val hasX = cum.columns.contains("sx_f")
    val mxF = col("sx_f") / col("n_f")
    val mxC = col("sx_c") / col("n_c")
    val xAggs =
      if (!hasX) Seq.empty
      else Seq(
        sum(when(pureF, mxF).otherwise(lit(0.0))).as("sx_a"),
        sum(when(pureF, mxF * mxF).otherwise(lit(0.0))).as("sxx_a"),
        sum(when(pureF, mxF * meanF).otherwise(lit(0.0))).as("sxy_a"),
        sum(when(pureC, mxC).otherwise(lit(0.0))).as("sx_b"),
        sum(when(pureC, mxC * mxC).otherwise(lit(0.0))).as("sxx_b"),
        sum(when(pureC, mxC * meanC).otherwise(lit(0.0))).as("sxy_b"))
    val aggs = Seq(
      sum(when(pureF, 1L).otherwise(0L)).as("n_a"),
      sum(when(pureF, meanF).otherwise(lit(0.0))).as("sum_a"),
      sum(when(pureF, meanF * meanF).otherwise(lit(0.0))).as("ssq_a"),
      sum(when(pureC, 1L).otherwise(0L)).as("n_b"),
      sum(when(pureC, meanC).otherwise(lit(0.0))).as("sum_b"),
      sum(when(pureC, meanC * meanC).otherwise(lit(0.0))).as("ssq_b")) ++
      xAggs :+
      sum(when(col("n_f") > 0 && col("n_c") > 0, 1L).otherwise(0L))
        .as("mixed_m")
    cum.groupBy("day").agg(aggs.head, aggs.tail: _*)
  }

  /** The mixture-SPRT ln Λ as a column — ONE home for the formula
    *   ln Λ = ½·ln(V/(V+τ²)) + Δ²τ²/(2·V·(V+τ²)),  ln Λ = 0 at V ≤ 0,
    * shared by call between [[alwaysValidP]] (conversion Δ/V),
    * [[alwaysValidPMean]] (Welch Δ/V via [[meanLogLambda]]), the
    * scorecard sink's commit-time folds, and the multi-arm sequential
    * readout ([[MultiArm.sequential]]) — so the arithmetic can never
    * drift between the two-arm and k-arm paths (the two-arm equality is
    * spec-pinned bitwise). */
  private[graft] def mSprtLogLambda(delta: Column, v: Column, tau: Double): Column = {
    val t2 = lit(tau * tau)
    when(v > 0.0,
      lit(0.5) * log(v / (v + t2)) +
        delta * delta * t2 / (lit(2.0) * v * (v + t2)))
      .otherwise(lit(0.0))
  }

  /** Normal-mean mSPRT ln Λ from cumulative (n, Σy, Σy²) pairs: the mean
    * difference in Δ's seat, the Welch variance (SAMPLE variances from
    * the moments) in V's — [[alwaysValidPMean]]'s arithmetic, callable
    * per-contrast by the multi-arm path. `na`/`nb` arrive pre-cast to
    * double. */
  private[graft] def meanLogLambda(
      na: Column, sumA: Column, ssqA: Column,
      nb: Column, sumB: Column, ssqB: Column, tau: Double): Column = {
    val ma = sumA / na
    val mb = sumB / nb
    val va = (ssqA - sumA * sumA / na) / (na - lit(1.0))
    val vb = (ssqB - sumB * sumB / nb) / (nb - lit(1.0))
    mSprtLogLambda(ma - mb, va / na + vb / nb, tau)
  }
}
