package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `experiment-report` CLI's analysis, extracted so a spec can pin
  * every section's values against the underlying operators (the CLI
  * itself only formats; nothing statistical lives in `Main`).
  *
  * The report runs in the order a platform runs it: assignment
  * integrity FIRST (a failed SRM voids everything after), then design
  * context, the raw vs variance-reduced lift, the Bayesian decision
  * quantities, and the subgroup-honesty gate. Two designs are read out
  * side by side on the SAME population:
  *
  *   - the iid design (arm hashed per USER) — sections 1-5; and
  *   - a cluster-randomized design (users fold into geo clusters,
  *     `user_id % 53`, and the ARM is hashed per GEO — what a
  *     market-level rollout actually does) — sections 2b/3b, where the
  *     iid Welch SE is dishonest and the Liang-Zeger readout plus the
  *     design effect deff = (robust_se/se)² are the decision-grade
  *     numbers. deff > 1 says each subject carries less than one
  *     subject's worth of information; the clustered MDE's `m_needed`
  *     prices the experiment in CLUSTERS, the unit that actually
  *     randomizes.
  *
  * Scale shape: the subject build is three keyed aggregations over
  * events + two joins, cached once and shared by every section; each
  * section is the underlying operator's own 1-2 aggregation contract. */
object ExperimentReport {

  /** Per-user subject frame: entry (first view), 7-day conversion,
    * STRICTLY pre-entry activity (a CUPED covariate fixed after entry
    * absorbs part of the effect), the per-user iid arm, a hash segment,
    * the geo cluster (`user_id % 53`) and the per-GEO arm. */
  def subjects(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, sfDir).select(
      col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val entry = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("entry_us"))
    val firstConv = ev.filter(col("event_type") === "purchase")
      .join(entry, "user_id").filter(col("us") >= col("entry_us"))
      .groupBy("user_id").agg(min(col("us")).as("conv_us"))
    val clicks = ev.join(entry, "user_id").filter(col("us") < col("entry_us"))
      .groupBy("user_id").agg(count(lit(1)).as("activity"))
    def hashBit(salt: String, key: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 4), 16, 10)
        .cast("int") % 2
    entry.join(firstConv, Seq("user_id"), "left")
      .join(clicks, Seq("user_id"), "left")
      .select(
        col("user_id"),
        to_date(timestamp_micros(col("entry_us"))).as("entry_day"),
        when(hashBit("ab-v1:", col("user_id")) === 1, lit("treat"))
          .otherwise(lit("ctrl")).as("arm"),
        concat(lit("seg"), hashBit("seg-v1:", col("user_id"))).as("segment"),
        (col("user_id") % 53).as("geo"),
        when(hashBit("geo-arm-v1:", col("user_id") % 53) === 1, lit("treat"))
          .otherwise(lit("ctrl")).as("arm_geo"),
        // the A/B/n designs (sections 7-9b): four arms per USER and four
        // arms per GEO — deterministic modulo, not a hash, so every arm
        // (incl. the control) exists even on a 15-user fixture
        concat(lit("a"), col("user_id") % 4).as("arm4"),
        concat(lit("a"), (col("user_id") % 53) % 4).as("arm4_geo"),
        ((col("conv_us").isNotNull) &&
          (col("conv_us") - col("entry_us")) < lit(7L * 86400000000L))
          .cast("int").as("conv"),
        coalesce(col("activity"), lit(0L)).cast("double").as("activity"))
  }

  /** Section 3b: the cluster-randomized lift — [[graft.ops.Cuped.cuped]]
    * with the geo cluster, plus the design effect each SE pair implies.
    * The Cuped columns pass through UNCHANGED (spec-pinned equal to the
    * direct call); this only appends deff_raw/deff_cuped =
    * (robust_se/se)² so the readout names the iid dishonesty factor. */
  def clusteredLift(subjects: DataFrame): DataFrame =
    graft.ops.Cuped.cuped(subjects, "arm_geo", "conv", "activity",
        focal = "treat", clusterCol = Some("geo"))
      .withColumn("deff_raw",
        col("robust_se_raw") * col("robust_se_raw")
          / (col("se_raw") * col("se_raw")))
      .withColumn("deff_cuped",
        col("robust_se_cuped") * col("robust_se_cuped")
          / (col("se_cuped") * col("se_cuped")))

  /** Section 2b: the clustered design arithmetic —
    * [[graft.ops.PowerAnalysis.mdeTwoSampleClustered]] on the geo
    * grid. `m_needed` is the report's honest price tag: clusters, not
    * subjects, are what a geo experiment buys. */
  def clusteredDesign(subjects: DataFrame): DataFrame =
    graft.ops.PowerAnalysis.mdeTwoSampleClustered(
      subjects, "activity", "geo")

  /** The mixture scale for the sequential sections: the conversion-lift
    * magnitude the monitor is most sensitive to (the operators'
    * conversion-scale default). */
  val sequentialTau: Double = 0.1

  /** The report's preview cut: looks where an arm is still under 5
    * subjects (or a side under 2 pure clusters) are previews, not
    * tests — low so a small fixture still shows the readout; the
    * always-valid p needs no minimum to stay honest. */
  val sequentialMinPerArm: Long = 5L

  private def refuseIfEmpty(df: DataFrame, what: String): DataFrame = {
    require(!df.isEmpty,
      s"no look qualifies for the $what yet (every look is below the " +
        s"preview cut of $sequentialMinPerArm per arm) — more data, not " +
        "a smaller cut, is the honest fix")
    df
  }

  /** Section 4 (iid): the ALWAYS-VALID readout — the monitor a reader
    * may poll at any time. [[graft.ops.SequentialTest.meanMonitor]] on
    * the 7-day conversion by entry day (looks = the fixture's entry-day
    * calendar) + `alwaysValidPMean`; the fixed-horizon sections above
    * are valid ONLY at the planned horizon, this one is valid under
    * continuous monitoring. Shown newest-last; `p_always_valid` is
    * nonincreasing, so the final row is the current evidence. */
  def sequentialLift(subjects: DataFrame): DataFrame = {
    val looks = subjects.select(col("entry_day").as("day")).distinct()
    val monitor = graft.ops.SequentialTest.meanMonitor(
      subjects, "arm", "entry_day", "conv", looks, "day", focal = "treat",
      minPerArm = sequentialMinPerArm)
    refuseIfEmpty(
      graft.ops.SequentialTest.alwaysValidPMean(monitor, sequentialTau)
        .select("day", "k", "n_a", "mean_a", "n_b", "mean_b",
          "log_lambda", "p_always_valid")
        .orderBy("day"),
      "sequential lift")
  }

  /** Section 4b (clustered): the always-valid readout at the unit that
    * actually randomizes — [[graft.ops.SequentialTest
    * .clusterMeanMonitor]] over the geo design (Δ and V from CLUSTER
    * means, the same Liang-Zeger honesty as section 3b) +
    * `alwaysValidPMean`. An iid monitor on a geo rollout peeks twice:
    * once in time, once in the understated V. */
  def clusteredSequentialLift(subjects: DataFrame): DataFrame = {
    val looks = subjects.select(col("entry_day").as("day")).distinct()
    val monitor = graft.ops.SequentialTest.clusterMeanMonitor(
      subjects, "arm_geo", "entry_day", "conv", "geo", looks, "day",
      focal = "treat", control = "ctrl")
    refuseIfEmpty(
      graft.ops.SequentialTest.alwaysValidPMean(monitor, sequentialTau)
        .select("day", "k", "n_a", "mean_a", "n_b", "mean_b", "mixed_m",
          "log_lambda", "p_always_valid")
        .orderBy("day"),
      "clustered sequential lift")
  }

  /** Section 4c: the variance-reduced clustered monitor —
    * [[clusteredSequentialLift]]'s CUPED twin
    * ([[graft.ops.SequentialTest.alwaysValidPMeanCuped]] over the
    * cluster-mean monitor with the pre-period activity as covariate):
    * the running pair-pooled θ at the CLUSTER level, the adjusted lift
    * and its always-valid p — what section 3b's fixed-horizon
    * robust+CUPED readout looks like when it is honest about peeking. */
  def clusteredSequentialLiftCuped(subjects: DataFrame): DataFrame = {
    val looks = subjects.select(col("entry_day").as("day")).distinct()
    val monitor = graft.ops.SequentialTest.clusterMeanMonitor(
      subjects, "arm_geo", "entry_day", "conv", "geo", looks, "day",
      focal = "treat", control = "ctrl", xCol = Some("activity"))
    refuseIfEmpty(
      graft.ops.SequentialTest.alwaysValidPMeanCuped(monitor, sequentialTau)
        .select("day", "k", "n_a", "n_b", "theta", "delta_cuped",
          "log_lambda_cuped", "p_always_valid_cuped")
        .orderBy("day"),
      "clustered CUPED sequential lift")
  }

  /** Every section in print order: (title, frame). A section's REFUSAL
    * is its honest answer (e.g. degenerate subgroups at tiny SF) — the
    * CLI prints the diagnosis and keeps reporting. */
  def sections(subjects: DataFrame): Seq[(String, () => DataFrame)] = Seq(
    "1. assignment integrity (SRM)" -> (() =>
      graft.ops.Contingency.srm(subjects, "arm",
        Seq("ctrl" -> 0.5, "treat" -> 0.5))),
    "2. design: what lift could this population detect" -> (() =>
      graft.ops.PowerAnalysis.mdeTwoSample(subjects, "activity")),
    "2b. clustered design (geo-randomized): deff-adjusted MDE, price in clusters" -> (() =>
      clusteredDesign(subjects)),
    "3. lift: raw vs CUPED — valid only at the planned horizon" -> (() =>
      graft.ops.Cuped.cuped(subjects, "arm", "conv", "activity",
        focal = "treat")),
    "3b. cluster-randomized lift (arm per geo): Liang-Zeger SEs + design effect — valid only at the planned horizon" -> (() =>
      clusteredLift(subjects)),
    "4. sequential lift (always-valid p): the readout a dashboard may poll" -> (() =>
      sequentialLift(subjects)),
    "4b. clustered sequential lift (cluster-mean mSPRT, always-valid p)" -> (() =>
      clusteredSequentialLift(subjects)),
    "4c. clustered CUPED sequential lift (running cluster-level theta, always-valid p)" -> (() =>
      clusteredSequentialLiftCuped(subjects)),
    "5. Bayesian decision quantities" -> (() =>
      graft.ops.BayesAb.betaBinomial(subjects, "arm", "conv",
        focal = "treat")),
    "6. subgroup honesty: is the pooled lift the whole story?" -> (() =>
      graft.ops.Hte.homogeneity(subjects, "segment", "arm", "conv",
        focal = "treat")))

  /** Column contract for CALLER-SUPPLIED subject frames
    * (`experiment-report --subjects <parquet>`): the report is
    * operational on real experiment data, not just the fixture
    * derivation — a frame missing a column its mode needs refuses BY
    * NAME before any section runs (a silently skipped section reads as
    * "checked and fine", the one thing a report must never do). */
  def requireSubjectColumns(df: DataFrame, arms: Boolean): DataFrame = {
    val needed =
      if (arms) Seq("arm4", "arm4_geo", "geo", "entry_day", "conv", "activity")
      else Seq("arm", "arm_geo", "geo", "segment", "entry_day", "conv",
        "activity")
    val missing = needed.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"--subjects frame is missing required column(s): " +
        s"${missing.mkString(", ")} (this mode reads: ${needed.mkString(", ")})")
    df
  }

  /** The A/B/n control arm for sections 7-9b. */
  val multiArmControl: String = "a0"

  /** The k-arm sequential sections use the HARD floor (2 per side), not
    * the two-arm preview cut: a k-way split of a small population puts
    * each arm near the cut, and the always-valid p needs no minimum to
    * stay honest — thin looks are visibly thin in their own n columns. */
  val multiArmMinPerArm: Long = 2L

  /** Section 9: the always-valid A/B/n —
    * [[graft.ops.MultiArm.sequential]] on the four user-hashed arms
    * with the pre-entry covariate; BH per look over the always-valid
    * ADJUSTED p's (e-BH — `discovery` can be acted on at any look). */
  def multiArmSequential(subjects: DataFrame): DataFrame = {
    val looks = subjects.select(col("entry_day").as("day")).distinct()
    refuseIfEmpty(
      graft.ops.MultiArm.sequential(
        subjects, "arm4", "entry_day", "conv", looks, "day",
        control = multiArmControl, tau = sequentialTau,
        minPerArm = multiArmMinPerArm, xCol = Some("activity"))
        .select("day", "arm", "k", "n", "delta", "theta", "delta_cuped",
          "p_always_valid_cuped", "m", "rk", "q_bh", "discovery")
        .orderBy("day", "arm"),
      "sequential A/B/n readout")
  }

  /** Section 9b: the always-valid CLUSTER-randomized A/B/n —
    * [[graft.ops.MultiArm.sequentialClustered]] on the four geo-level
    * arms: cluster-mean mSPRT per contrast, first-touch attribution,
    * BH per look. The honest monitor for a k-way market rollout. */
  def multiArmSequentialClustered(subjects: DataFrame): DataFrame = {
    val looks = subjects.select(col("entry_day").as("day")).distinct()
    refuseIfEmpty(
      graft.ops.MultiArm.sequentialClustered(
        subjects, "arm4_geo", "entry_day", "conv", "geo", looks, "day",
        control = multiArmControl, tau = sequentialTau,
        minClusters = multiArmMinPerArm, xCol = Some("activity"))
        .select("day", "arm", "k", "n", "mixed_m", "delta", "theta",
          "delta_cuped", "p_always_valid_cuped", "m", "rk", "q_bh",
          "discovery")
        .orderBy("day", "arm"),
      "clustered sequential A/B/n readout")
  }

  /** The A/B/n sections (the `--arms` report): the same population read
    * as a FOUR-arm experiment, iid and cluster-randomized, fixed-horizon
    * and always-valid — every readout multiplicity-controlled (BH q per
    * comparison; raw per-arm p < 0.05 on an A/B/C/D is the mistake
    * these sections exist to prevent). */
  def multiArmSections(subjects: DataFrame): Seq[(String, () => DataFrame)] = Seq(
    "7. A/B/n assignment integrity (k-arm SRM)" -> (() =>
      graft.ops.Contingency.srm(subjects, "arm4",
        Seq("a0" -> 0.25, "a1" -> 0.25, "a2" -> 0.25, "a3" -> 0.25))),
    "8. A/B/n fixed-horizon readout (Welch vs control + BH FDR, CUPED-adjusted) — valid only at the planned horizon" -> (() =>
      graft.ops.MultiArm.report(subjects, "arm4", "conv",
        control = multiArmControl, xCol = Some("activity"))),
    "8b. cluster-randomized A/B/n (cluster means, cluster-level theta + BH) — valid only at the planned horizon" -> (() =>
      graft.ops.MultiArm.reportClustered(subjects, "arm4_geo", "conv",
        "geo", control = multiArmControl, xCol = Some("activity"))),
    "9. sequential A/B/n (always-valid p + e-BH): the k-arm dashboard readout" -> (() =>
      multiArmSequential(subjects)),
    "9b. clustered sequential A/B/n (cluster-mean mSPRT + e-BH)" -> (() =>
      multiArmSequentialClustered(subjects)))
}
