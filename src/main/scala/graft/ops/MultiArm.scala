package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B/n readout — every treatment arm against the ONE control, with
  * the multiplicity correction the fan-out demands. The two-arm tools
  * ([[Cuped]], [[Contingency.srm]]'s lift cousins, [[SequentialTest]])
  * deliberately refuse a third arm; this is the honest home for it:
  * k−1 vs-control contrasts are k−1 chances at a false win, so the
  * per-arm p is reported WITH its Benjamini-Hochberg q-value and the
  * discovery flag at the caller's FDR level — shipping raw per-arm
  * p < 0.05 on an A/B/C/D is the multiplicity mistake this op exists
  * to prevent.
  *
  * Per arm: (n, mean, delta, se, z, p, q_bh, discovery) where delta is
  * vs-control, se the Welch two-sample SE from per-arm sample moments,
  * p the two-sided normal tail (the fixed A&S 7.1.26 polynomial — the
  * same arithmetic as `Stats.pNormTwoSided` and every oracle), and
  * q_bh the step-up q-value: q_(i) = min_{j ≥ i} p_(j)·m/j over the
  * m = k−1 comparisons ordered by (p, arm) (monotone by construction;
  * discovery ⇔ q ≤ fdr, exactly the BH rejection set).
  *
  * Scale shape: ONE keyed aggregation to the arm grid, collected
  * BOUNDED (`.limit(66)` IN the plan — the maxTimes discipline: a
  * million-level arm column ships at most 66 rows before refusing by
  * name), then closed-form driver arithmetic over ≤64 rows — the
  * [[Cuped]]/[[PowerAnalysis]] pattern for design-sized grids.
  * Refusals by name: a missing control, fewer than two arms, an arm
  * too thin for a sample variance, and an arm column with more than
  * 64 levels (that is a segmentation, not an experiment). */
object MultiArm {

  private final case class ArmRow(
      arm: String, n: Long, s: Double, ss: Double,
      sx: Double, sxx: Double, sxy: Double)

  /** Φ tail-based two-sided p via A&S 7.1.26 — scalar twin of
    * `Stats.pNormTwoSided` (identical constants; the oracles replay the
    * same polynomial). */
  private def pTwoSided(z: Double): Double = {
    val a = math.abs(z)
    val t = 1.0 / (1.0 + 0.2316419 * a)
    2.0 * (math.exp(-a * a / 2.0) / math.sqrt(2.0 * math.Pi) *
      (0.319381530 * t - 0.356563782 * math.pow(t, 2) +
        1.781477937 * math.pow(t, 3) - 1.821255978 * math.pow(t, 4) +
        1.330274429 * math.pow(t, 5)))
  }

  /** @param xCol optional PRE-period covariate: each contrast is then
    *        CUPED-adjusted with the PAIR-POOLED θ (treatment ∪ control
    *        moments — exactly [[Cuped.cuped]]'s θ on that pair, so the
    *        two-arm case reproduces it bit-for-bit, spec-pinned), the
    *        output adds theta/delta_cuped/se_cuped/z_cuped/p_cuped,
    *        and the BH ranking runs over the ADJUSTED p — the
    *        decision-grade column once a covariate is declared (the
    *        raw p stays beside it). A constant covariate gives θ = 0
    *        and the adjusted columns degrade to the raw ones. */
  def report(
      subjects: DataFrame, armCol: String, yCol: String, control: String,
      fdr: Double = 0.05, xCol: Option[String] = None): DataFrame = {
    require(fdr > 0 && fdr < 1, s"fdr must be in (0,1), got $fdr")
    val spark = subjects.sparkSession
    import spark.implicits._
    val arm = col(armCol).cast("string")
    val y = col(yCol).cast("double")
    val x = xCol.map(c => col(c).cast("double")).getOrElse(lit(0.0))
    val grid = subjects.groupBy(arm.as("arm"))
      .agg(count(lit(1)).as("n"), sum(y).as("s"), sum(y * y).as("ss"),
        sum(x).as("sx"), sum(x * x).as("sxx"), sum(x * y).as("sxy"))
      .limit(66) // the refusal below never materializes what it refuses
      .collect()
      .map(r => ArmRow(r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // first, before any sort over arm names would NPE on it: a null arm
    // is an assignment bug, named as such rather than surfacing as a
    // level-cap trip or an opaque NullPointerException
    require(!grid.exists(_.arm == null),
      s"arm column '$armCol' contains nulls — every subject needs an arm " +
        "(filter unassigned subjects out before the readout)")
    require(grid.length <= 64,
      s"arm column '$armCol' has more than 64 levels — that is a " +
        "segmentation, not an experiment (check the column)")
    require(grid.length >= 2,
      s"multi-arm report needs at least control + one treatment; found " +
        s"${grid.length} arm(s): ${grid.map(_.arm).sorted.mkString(", ")}")
    require(grid.exists(_.arm == control),
      s"control arm '$control' not present; arms are " +
        grid.map(_.arm).sorted.mkString(", "))
    val thin = grid.filter(_.n < 2).map(_.arm)
    require(thin.isEmpty,
      s"arm(s) too thin for a sample variance (n < 2): ${thin.sorted.mkString(", ")}")
    val c = grid.find(_.arm == control).get
    val nc = c.n.toDouble
    def varS(ss: Double, s: Double, n: Double) = (ss - s * s / n) / (n - 1.0)
    val scored = grid.filter(_.arm != control).map { t =>
      val nt = t.n.toDouble
      val mT = t.s / nt
      val mC = c.s / nc
      val delta = mT - mC
      val se = math.sqrt(varS(t.ss, t.s, nt) / nt + varS(c.ss, c.s, nc) / nc)
      val z = if (se > 0.0) delta / se else 0.0
      val cuped = xCol.map { _ =>
        // pair-pooled θ: total (not per-arm) covariance over this
        // contrast's union — Cuped.cuped's estimator on the pair
        val nn = nt + nc
        val sxP = t.sx + c.sx
        val syP = t.s + c.s
        val varXn = (t.sxx + c.sxx) - sxP * sxP / nn
        val theta =
          if (varXn > 0.0) ((t.sxy + c.sxy) - sxP * syP / nn) / varXn else 0.0
        def adjVar(r: ArmRow, n: Double) = {
          val vy = varS(r.ss, r.s, n)
          val vx = varS(r.sxx, r.sx, n)
          val cxy = (r.sxy - r.sx * r.s / n) / (n - 1.0)
          vy - 2.0 * theta * cxy + theta * theta * vx
        }
        val mx = sxP / nn
        val deltaC = (mT - theta * (t.sx / nt - mx)) - (mC - theta * (c.sx / nc - mx))
        val seC = math.sqrt(adjVar(t, nt) / nt + adjVar(c, nc) / nc)
        val zC = if (seC > 0.0) deltaC / seC else 0.0
        (theta, deltaC, seC, zC, pTwoSided(zC))
      }
      (t.arm, t.n, mT, delta, se, z, pTwoSided(z), cuped)
    }
    // BH step-up over the m comparisons ordered by the decision-grade p
    // (adjusted when a covariate is declared), ties broken by arm name
    val m = scored.length
    val ranked = scored.sortBy(r => (r._8.map(_._5).getOrElse(r._7), r._1))
    val qs = new Array[Double](m)
    var suffixMin = Double.PositiveInfinity
    for (i <- (m - 1) to 0 by -1) {
      val p = ranked(i)._8.map(_._5).getOrElse(ranked(i)._7)
      suffixMin = math.min(suffixMin, p * m / (i + 1))
      qs(i) = math.min(1.0, suffixMin)
    }
    val out = ranked.zipWithIndex.map { case ((a, n, mean, d, se, z, p, cu), i) =>
      (a, n, mean, d, se, z, p,
        cu.map(_._1), cu.map(_._2), cu.map(_._3), cu.map(_._4), cu.map(_._5),
        (i + 1).toLong, qs(i), qs(i) <= fdr)
    }.toSeq
    val full = out.toDF("arm", "n", "mean", "delta", "se", "z", "p",
      "theta", "delta_cuped", "se_cuped", "z_cuped", "p_cuped",
      "k", "q_bh", "discovery")
    if (xCol.isEmpty)
      full.drop("theta", "delta_cuped", "se_cuped", "z_cuped", "p_cuped")
    else full
  }

  /** ALWAYS-VALID A/B/n — [[report]]'s sequential companion: the
    * fixed-horizon Welch readout above is only honest at the planned
    * horizon, but a k-arm dashboard is read continuously — the newest
    * invitation to peek. This op composes the two honest pieces: a
    * per-contrast normal-mean mixture SPRT
    * ([[SequentialTest.meanLogLambda]], called — the identical
    * arithmetic as [[SequentialTest.alwaysValidPMean]], so the two-arm
    * case reproduces it bitwise, spec-pinned) over each of the k−1
    * arm-vs-control contrasts' CUMULATIVE moments, then
    * Benjamini-Hochberg per look over the ALWAYS-VALID p's. BH stays
    * FDR-valid under optional stopping when its inputs are always-valid
    * p's / e-values (each 1/p̄ is a nonnegative supermartingale bound —
    * the e-BH result of Wang & Ramdas 2022, "False discovery rate
    *  control with e-values", JRSS-B; mSPRT p's are exactly of that
    * form, Johari-Pekelis-Walsh 2017), so `discovery` can be acted on
    * at ANY look, not just the planned horizon.
    *
    * One row per (qualifying look, treatment arm): cumulative n/mean,
    * delta vs control, the contrast's ln Λ and nonincreasing
    * p_always_valid, and that look's BH rank/q/discovery across the
    * arms qualifying at the look. `k` counts the contrast's OWN
    * qualifying looks (arms can enter the readout on different days).
    *
    * @param xCol optional PRE-period covariate: each contrast is
    *        CUPED-adjusted at every look with the pair-pooled θ from
    *        the CUMULATIVE pair moments — [[report]]'s estimator on the
    *        data-so-far, the same running-θ policy as the streaming
    *        scorecard's CUPED fold — and the mixture SPRT runs with the
    *        adjusted lift in Δ's seat and its Welch variance in V's
    *        (adds theta / delta_cuped / se_cuped / log_lambda_cuped /
    *        p_always_valid_cuped; BH ranks the ADJUSTED p, the
    *        decision-grade column once a covariate is declared). At the
    *        final look the cumulative moments are the totals, so
    *        theta/delta_cuped/se_cuped equal [[report]]'s fixed-horizon
    *        columns exactly (spec-pinned).
    *
    * Scale shape: ONE keyed aggregation of subjects onto (arm, day) —
    * the only data-sized pass — then cumulative windows over the
    * calendar×arms grid (bounded by design), a broadcast-sized join of
    * treatments against the control row per day, and BH as a window
    * partitioned by day over ≤63 rows. Arm refusals (nulls, missing
    * control, <2 or >64 levels) shared with [[report]]'s, from one
    * bounded `.limit(66)` distinct probe. */
  def sequential(
      subjects: DataFrame, armCol: String, dayCol: String, valueCol: String,
      looks: DataFrame, lookCol: String, control: String, tau: Double,
      fdr: Double = 0.05, minPerArm: Long = 30L,
      xCol: Option[String] = None): DataFrame = {
    require(tau > 0, s"tau must be positive (the mixture scale), got $tau")
    require(fdr > 0 && fdr < 1, s"fdr must be in (0,1), got $fdr")
    val spark = subjects.sparkSession
    import spark.implicits._
    val arm = col(armCol).cast("string")
    val y = col(valueCol).cast("double")
    val x = xCol.map(c => col(c).cast("double")).getOrElse(lit(0.0))
    val armVals = subjects.select(arm.as("arm")).distinct()
      .limit(66).collect().map(_.getString(0)).toSeq
    require(!armVals.contains(null),
      s"arm column '$armCol' contains nulls — every subject needs an arm " +
        "(filter unassigned subjects out before the readout)")
    require(armVals.length <= 64,
      s"arm column '$armCol' has more than 64 levels — that is a " +
        "segmentation, not an experiment (check the column)")
    require(armVals.length >= 2,
      s"multi-arm monitor needs at least control + one treatment; found " +
        s"${armVals.length} arm(s): ${armVals.sorted.mkString(", ")}")
    require(armVals.contains(control),
      s"control arm '$control' not present; arms are " +
        armVals.sorted.mkString(", "))
    val daily = subjects.groupBy(arm.as("arm"), col(dayCol).as("day"))
      .agg(count(lit(1)).as("en"), sum(y).as("sv"), sum(y * y).as("svv"),
        sum(x).as("svx"), sum(x * x).as("svxx"), sum(x * y).as("svxy"))
    val grid = looks.select(col(lookCol).as("day")).distinct()
      .crossJoin(broadcast(armVals.toDF("arm"))) // calendar × ≤64 arms
      .join(daily, Seq("arm", "day"), "left")
      .select(col("arm"), col("day"),
        coalesce(col("en"), lit(0L)).as("en"),
        coalesce(col("sv"), lit(0.0)).as("sv"),
        coalesce(col("svv"), lit(0.0)).as("svv"),
        coalesce(col("svx"), lit(0.0)).as("svx"),
        coalesce(col("svxx"), lit(0.0)).as("svxx"),
        coalesce(col("svxy"), lit(0.0)).as("svxy"))
    val byArm = Window.partitionBy("arm").orderBy("day")
    val cum = grid
      .withColumn("n", sum("en").over(byArm))
      .withColumn("s", sum("sv").over(byArm))
      .withColumn("ss", sum("svv").over(byArm))
      .withColumn("sx", sum("svx").over(byArm))
      .withColumn("sxx", sum("svxx").over(byArm))
      .withColumn("sxy", sum("svxy").over(byArm))
      .select("arm", "day", "n", "s", "ss", "sx", "sxx", "sxy")
    sequentialContrasts(cum, control, tau, fdr,
      math.max(minPerArm, 2L), xCol.isDefined)
  }

  /** The per-contrast mSPRT + per-look BH tail shared by
    * [[sequential]] (subject moments) and [[sequentialClustered]]
    * (cluster-mean moments): `cum` is a complete calendar × arms grid
    * of cumulative per-arm unit moments (arm, day, n, s, ss, sx, sxx,
    * sxy) — the tail never cares what the unit is, which is exactly why
    * the two monitors cannot drift. */
  private def sequentialContrasts(
      cum: DataFrame, control: String, tau: Double, fdr: Double,
      floor: Long, cuped: Boolean): DataFrame =
    bhPerLook(runMaxP(contrastStats(cum, control, tau, floor, cuped), cuped),
      fdr, cuped)

  /** Per-(look, contrast) statistics from cumulative unit moments — the
    * joins and arithmetic of the tail WITHOUT the running-max p and BH
    * (those need a run-max policy: batch-local for [[sequential]]/
    * [[sequentialClustered]] via [[runMaxP]], prior-state-offset for the
    * streaming A/B/n fold which reads its prior max from the arm
    * ledger). Emits one row per qualifying (day, arm ≠ control):
    * k / n / mean / delta / log_lambda (+ theta / delta_cuped /
    * se_cuped / log_lambda_cuped when `cuped`) — every value a pure
    * function of the cumulative moments, so prior-batch offsets folded
    * INTO the moments come out exactly right. */
  private[graft] def contrastStats(
      cum: DataFrame, control: String, tau: Double, floor: Long,
      cuped: Boolean): DataFrame = {
    val byArm = Window.partitionBy("arm").orderBy("day")
    val ctrl = cum.filter(col("arm") === control)
      .select(col("day"), col("n").as("n_c"), col("s").as("s_c"),
        col("ss").as("ss_c"), col("sx").as("sx_c"), col("sxx").as("sxx_c"),
        col("sxy").as("sxy_c"))
    val contrasts = cum.filter(col("arm") =!= control)
      .join(ctrl, "day")
      .filter(col("n") >= floor && col("n_c") >= floor)
      .withColumn("k", row_number().over(byArm).cast("long"))
    val nt = col("n").cast("double")
    val nc = col("n_c").cast("double")
    val rawLl = SequentialTest.meanLogLambda(
      nt, col("s"), col("ss"), nc, col("s_c"), col("ss_c"), tau)
    val base = contrasts
      .withColumn("mean", col("s") / nt)
      .withColumn("delta", col("s") / nt - col("s_c") / nc)
      .withColumn("log_lambda", rawLl)
    if (!cuped) base
    else {
      // pair-pooled θ from the CUMULATIVE pair moments — report's
      // estimator evaluated on the data-so-far at each look
      val nn = nt + nc
      val sxP = col("sx") + col("sx_c")
      val syP = col("s") + col("s_c")
      val varXn = (col("sxx") + col("sxx_c")) - sxP * sxP / nn
      val theta = when(varXn > 0.0,
        ((col("sxy") + col("sxy_c")) - sxP * syP / nn) / varXn)
        .otherwise(lit(0.0))
      def adjVar(ss: Column, s: Column, sxx: Column, sx: Column,
          sxy: Column, n: Column, th: Column): Column = {
        val vy = (ss - s * s / n) / (n - lit(1.0))
        val vx = (sxx - sx * sx / n) / (n - lit(1.0))
        val cxy = (sxy - sx * s / n) / (n - lit(1.0))
        vy - lit(2.0) * th * cxy + th * th * vx
      }
      val mx = sxP / nn
      val th = col("theta")
      val deltaC = (col("s") / nt - th * (col("sx") / nt - mx)) -
        (col("s_c") / nc - th * (col("sx_c") / nc - mx))
      val withTheta = base.withColumn("theta", theta)
      val vC =
        adjVar(col("ss"), col("s"), col("sxx"), col("sx"), col("sxy"), nt, th) / nt +
        adjVar(col("ss_c"), col("s_c"), col("sxx_c"), col("sx_c"), col("sxy_c"), nc, th) / nc
      withTheta
        .withColumn("delta_cuped", deltaC)
        .withColumn("se_cuped", when(vC > 0.0, sqrt(vC)).otherwise(lit(0.0)))
        .withColumn("log_lambda_cuped",
          SequentialTest.mSprtLogLambda(deltaC, vC, tau))
    }
  }

  /** The batch-local run-max fold: p_always_valid(_cuped) =
    * min(1, e^{−max ln Λ so far}) per contrast, the whole history in
    * frame. The streaming fold replaces this piece with a prior-offset
    * greatest() — everything else identical by call. */
  private[graft] def runMaxP(stats: DataFrame, cuped: Boolean): DataFrame = {
    val runMax = Window.partitionBy("arm").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = stats.withColumn("p_always_valid",
      least(lit(1.0), exp(-max(col("log_lambda")).over(runMax))))
    if (!cuped) base
    else base.withColumn("p_always_valid_cuped",
      least(lit(1.0), exp(-max(col("log_lambda_cuped")).over(runMax))))
  }

  /** BH per look over the decision-grade always-valid p (adjusted when a
    * covariate is declared) — e-BH: valid at any look. m counts the
    * contrasts QUALIFYING at the look (arms can enter on different
    * days). Emits the final column order shared by every sequential
    * A/B/n surface (batch subject-level, batch cluster-level, streaming
    * fold). */
  private[graft] def bhPerLook(
      scored: DataFrame, fdr: Double, cuped: Boolean): DataFrame = {
    val pSel = if (!cuped) col("p_always_valid") else col("p_always_valid_cuped")
    val withP = scored.withColumn("p_sel", pSel)
    val byLook = Window.partitionBy("day").orderBy(col("p_sel"), col("arm"))
    val lookAll = Window.partitionBy("day")
    val ranked = withP
      .withColumn("m", count(lit(1)).over(lookAll))
      .withColumn("rk", row_number().over(byLook).cast("long"))
      .withColumn("q_bh", least(lit(1.0),
        min(col("p_sel") * col("m") / col("rk")).over(
          byLook.rowsBetween(Window.currentRow, Window.unboundedFollowing))))
      .withColumn("discovery", col("q_bh") <= fdr)
    val keep = Seq("day", "arm", "k", "n", "mean", "delta", "log_lambda",
      "p_always_valid") ++
      (if (!cuped) Seq.empty
       else Seq("theta", "delta_cuped", "se_cuped", "log_lambda_cuped",
         "p_always_valid_cuped")) ++
      Seq("m", "rk", "q_bh", "discovery")
    ranked.select(keep.map(col): _*)
  }

  /** CLUSTER-randomized A/B/n — [[report]] when assignment happens
    * ABOVE the subject (geos, stores): the unit of analysis is the
    * CLUSTER, each arm's sample is its clusters' unweighted per-cluster
    * means, and every contrast's Welch SE comes from the variance OF
    * those means — the design-honest SE an iid readout would understate
    * under intra-cluster correlation (the same policy as
    * [[SequentialTest.clusterMeanMonitor]] and the clustered scorecard).
    * Clusters that received MORE than one arm are excluded from every
    * arm's sample and counted in the constant `mixed_m` column — a
    * mixed cluster has no honest arm. Null arms refuse by name (a null
    * inside a cluster would otherwise silently pass the purity check).
    * With one-subject clusters this IS [[report]] (spec-pinned).
    *
    * Scale shape: one data-sized aggregation onto clusters, one
    * cluster-sized head aggregation (mixed/null counts), then
    * [[report]]'s bounded arm grid over the cluster means. CUPED
    * (`xCol`) adjusts with the pair-pooled θ over CLUSTER-MEAN
    * covariates — [[Cuped]]'s estimator at the cluster level. */
  def reportClustered(
      subjects: DataFrame, armCol: String, yCol: String, clusterCol: String,
      control: String, fdr: Double = 0.05,
      xCol: Option[String] = None): DataFrame = {
    require(fdr > 0 && fdr < 1, s"fdr must be in (0,1), got $fdr")
    val arm = col(armCol).cast("string")
    val y = col(yCol).cast("double")
    val x = xCol.map(c => col(c).cast("double")).getOrElse(lit(0.0))
    val cl = subjects
      .groupBy(col(clusterCol).cast("string").as("cluster"))
      .agg(min(arm).as("a_min"), max(arm).as("a_max"),
        sum(when(arm.isNull, 1L).otherwise(0L)).as("nulls"),
        count(lit(1)).as("cn"), sum(y).as("csy"), sum(x).as("csx"))
    val head = cl.agg(
      sum(when(col("a_min") =!= col("a_max"), 1L).otherwise(0L)).as("mixed"),
      sum(col("nulls")).as("nulls")).collect()(0)
    val nullCnt = Option(head.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    require(nullCnt == 0L,
      s"arm column '$armCol' contains nulls — every subject needs an arm " +
        "(filter unassigned subjects out before the readout)")
    val mixedM = Option(head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val pure = cl.filter(col("a_min") === col("a_max"))
      .select(col("a_min").as("arm"),
        (col("csy") / col("cn")).as("my"),
        (col("csx") / col("cn")).as("mx"))
    report(pure, "arm", "my", control, fdr, xCol.map(_ => "mx"))
      .withColumn("mixed_m", lit(mixedM))
  }

  /** ALWAYS-VALID cluster-randomized A/B/n — the last cell of the
    * design lattice: k arms ([[sequential]]'s multiplicity problem) ×
    * cluster assignment ([[SequentialTest.clusterMeanMonitor]]'s
    * variance problem) × continuous reads (the peeking problem). Each
    * of the k−1 contrasts runs the normal-mean mixture SPRT over the
    * CUMULATIVE moments of its arms' per-cluster CUMULATIVE means, then
    * Benjamini-Hochberg per look over the always-valid p's (e-BH, valid
    * at any look — [[sequential]]'s citation). The entire contrast/BH
    * tail is [[sequential]]'s own code by call — only the unit moments
    * differ — so the subject-level and cluster-level monitors cannot
    * drift.
    *
    * "Which clusters count" is decided CUMULATIVELY, as in
    * [[SequentialTest.clusterLookStats]]: a cluster belongs to the arm
    * that touched it first and contributes from that day until the day
    * a SECOND arm touches it, after which it is excluded forever and
    * counted in that look's `mixed_m` (two arms on the same first day =
    * mixed immediately). With two arms this reproduces
    * `clusterMeanMonitor` + `alwaysValidPMean(Cuped)` exactly; with
    * one-subject clusters it reproduces [[sequential]] (both
    * spec-pinned).
    *
    * Scale shape: TWO data-sized aggregations (per-(cluster, day) sums
    * and per-(cluster, arm) first-touch), then the calendar × clusters
    * grid ([[SequentialTest.clusterMeanMonitor]]'s design-sized state),
    * one grid-sized aggregation onto (day, arm), and [[sequential]]'s
    * broadcast-sized contrast/BH tail.
    *
    * @param minClusters per-side floor of contributing clusters before
    *        a contrast qualifies (hard floor 2 — a cluster-mean
    *        variance needs two clusters) */
  def sequentialClustered(
      subjects: DataFrame, armCol: String, dayCol: String, valueCol: String,
      clusterCol: String, looks: DataFrame, lookCol: String, control: String,
      tau: Double, fdr: Double = 0.05, minClusters: Long = 2L,
      xCol: Option[String] = None): DataFrame = {
    require(tau > 0, s"tau must be positive (the mixture scale), got $tau")
    require(fdr > 0 && fdr < 1, s"fdr must be in (0,1), got $fdr")
    val arm = col(armCol).cast("string")
    val y = col(valueCol).cast("double")
    val x = xCol.map(c => col(c).cast("double")).getOrElse(lit(0.0))
    // arm refusals shared with sequential/report, one bounded probe
    val armVals = subjects.select(arm.as("arm")).distinct()
      .limit(66).collect().map(_.getString(0)).toSeq
    require(!armVals.contains(null),
      s"arm column '$armCol' contains nulls — every subject needs an arm " +
        "(filter unassigned subjects out before the readout)")
    require(armVals.length <= 64,
      s"arm column '$armCol' has more than 64 levels — that is a " +
        "segmentation, not an experiment (check the column)")
    require(armVals.length >= 2,
      s"multi-arm monitor needs at least control + one treatment; found " +
        s"${armVals.length} arm(s): ${armVals.sorted.mkString(", ")}")
    require(armVals.contains(control),
      s"control arm '$control' not present; arms are " +
        armVals.sorted.mkString(", "))
    val clc = col(clusterCol).cast("string")
    // the two data-sized passes: per-(cluster, day) sums and the
    // first-touch attribution
    val clusterDaily = subjects
      .groupBy(clc.as("cluster"), col(dayCol).as("day"))
      .agg(count(lit(1)).as("dn"), sum(y).as("dsy"), sum(x).as("dsx"))
    val firstTouch = subjects.groupBy(clc.as("cluster"), arm.as("arm"))
      .agg(min(col(dayCol)).as("fd"))
    val byFd = Window.partitionBy("cluster").orderBy(col("fd"), col("arm"))
    val meta = firstTouch.withColumn("rn", row_number().over(byFd))
      .groupBy("cluster").agg(
        max(when(col("rn") === 1, col("arm"))).as("own_arm"),
        min(when(col("rn") === 2, col("fd"))).as("mixed_day"))
    val grid = looks.select(col(lookCol).as("day")).distinct()
      .crossJoin(meta) // calendar × design-sized cluster set
      .join(clusterDaily, Seq("cluster", "day"), "left")
    val byCl = Window.partitionBy("cluster").orderBy("day")
    val cumCl = grid
      .withColumn("cn", sum(coalesce(col("dn"), lit(0L))).over(byCl))
      .withColumn("csy", sum(coalesce(col("dsy"), lit(0.0))).over(byCl))
      .withColumn("csx", sum(coalesce(col("dsx"), lit(0.0))).over(byCl))
    // a cluster contributes its CUMULATIVE mean to its first-touch arm
    // while still pure at the look; my/mx are only evaluated under
    // contrib (cn > 0 there, no 0/0)
    val contrib = col("cn") > 0 &&
      (col("mixed_day").isNull || col("day") < col("mixed_day"))
    val my = col("csy") / col("cn")
    val mx = col("csx") / col("cn")
    val cum = cumCl.groupBy(col("day"), col("own_arm").as("arm")).agg(
      sum(when(contrib, 1L).otherwise(0L)).as("n"),
      sum(when(contrib, my).otherwise(lit(0.0))).as("s"),
      sum(when(contrib, my * my).otherwise(lit(0.0))).as("ss"),
      sum(when(contrib, mx).otherwise(lit(0.0))).as("sx"),
      sum(when(contrib, mx * mx).otherwise(lit(0.0))).as("sxx"),
      sum(when(contrib, mx * my).otherwise(lit(0.0))).as("sxy"))
    val mixedPerDay = cumCl.groupBy("day").agg(
      sum(when(col("mixed_day").isNotNull && col("day") >= col("mixed_day"),
        1L).otherwise(0L)).as("mixed_m"))
    sequentialContrasts(cum, control, tau, fdr,
      math.max(minClusters, 2L), xCol.isDefined)
      .join(mixedPerDay, "day")
  }
}
