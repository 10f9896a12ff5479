package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment DESIGN arithmetic — the question every A/B test must
  * answer BEFORE it runs: "what lift can this many subjects detect, and
  * how many subjects does the lift we care about need?" Underpowered
  * tests ship noise (a 'significant' result from an underpowered test
  * overstates the true effect — the winner's curse the q340 sequential
  * family exists to contain); the MDE/required-n pair is what makes the
  * power budget explicit.
  *
  * Scale shape: ONE aggregation over the metric frame (n, mean,
  * variance — a single row out), then closed-form COLUMN arithmetic (no
  * collect at all): MDE = (z_{α/2} + z_{power})·√(σ²·(1/q + 1/(1−q))/n)
  * for an n-subject test split q/(1−q), and required n inverts it for a
  * target relative lift. Φ⁻¹ via the fixed Abramowitz-Stegun 26.2.23
  * rational approximation (|ε| < 4.5e-4) — the same
  * fixed-polynomial-in-both-engines discipline as the p-value family,
  * so a DuckDB oracle replays it digit for digit. */
object PowerAnalysis {

  /** Upper-tail probit: the z > 0 with P(Z > z) = p, for p ∈ (0, 0.5]
    * — A&S 26.2.23. */
  private[graft] def probitUpper(p: Column): Column = {
    val t = sqrt(lit(-2.0) * log(p))
    t - (lit(2.515517) + lit(0.802853) * t + lit(0.010328) * t * t) /
      (lit(1.0) + lit(1.432788) * t + lit(0.189269) * t * t +
        lit(0.001308) * t * t * t)
  }

  /** One row: (n, mean, variance, z_alpha, z_power, mde_abs, mde_rel,
    * n_needed) — the two-sample design numbers for the metric in
    * `valueCol`, assuming the experiment splits these n subjects
    * `split`/(1−split) and both arms share the observed variance (the
    * standard pre-test assumption). `n_needed` is the TOTAL subjects
    * for the `targetRelLift` relative effect at this α/power. */
  def mdeTwoSample(
      df: DataFrame, valueCol: String,
      alpha: Double = 0.05, power: Double = 0.8, split: Double = 0.5,
      targetRelLift: Double = 0.02): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(power >= 0.5 && power < 1,
      s"power must be in [0.5, 1) (the probit approximation's domain), got $power")
    require(split > 0 && split < 1, s"split must be in (0,1), got $split")
    require(targetRelLift > 0, s"targetRelLift must be positive, got $targetRelLift")
    val agg = df.agg(
      count(col(valueCol)).as("n"),
      avg(col(valueCol).cast("double")).as("mean"),
      var_samp(col(valueCol).cast("double")).as("variance"))
    val zA = probitUpper(lit(alpha / 2.0))
    val zB = probitUpper(lit(1.0 - power))
    val designVar = col("variance") * (lit(1.0 / split) + lit(1.0 / (1.0 - split)))
    val mdeAbs = (zA + zB) * sqrt(designVar / col("n"))
    // a RELATIVE lift target is meaningless against a non-positive mean
    // (and ANSI would throw casting the resulting ∞ to long) — those
    // columns go honestly null instead
    val nNeeded = when(col("mean") > 0,
      ceil((zA + zB) * (zA + zB) * designVar /
        ((lit(targetRelLift) * col("mean")) * (lit(targetRelLift) * col("mean"))))
        .cast("long"))
    agg.select(
      col("n"), col("mean"), col("variance"),
      zA.as("z_alpha"), zB.as("z_power"),
      mdeAbs.as("mde_abs"),
      when(col("mean") > 0, mdeAbs / col("mean")).as("mde_rel"),
      nNeeded.as("n_needed"))
  }

  /** CLUSTER-randomized design arithmetic: when the experiment assigns
    * whole clusters (geos, stores, accounts), the iid [[mdeTwoSample]]
    * numbers are optimistic by the DESIGN EFFECT deff = V̂_cl(ȳ)·n/σ²
    * (the Kish factor, ≈ 1 + (n̄_c − 1)·ICC): subjects within a cluster
    * co-move, so each additional subject buys less than one subject of
    * information. V̂_cl(ȳ) is the one-way cluster-robust variance of
    * the overall mean — m/(m−1)·Σ_c (S_c − n_c·ȳ)²/n² from per-cluster
    * SUMS, the same Liang-Zeger fold as [[Cuped]]'s clustered SEs — and
    * an arm holding fraction q of the m clusters has variance
    * V̂_cl(ȳ)/q, so MDE = (z_{α/2}+z_{power})·√(V̂_cl·(1/q+1/(1−q)))
    * and the required totals scale by deff. Scale shape: ONE keyed
    * aggregation to the cluster grid, ONE global aggregation over it,
    * closed-form column arithmetic — no collect.
    *
    * One row: (n, m, mean, variance, var_cluster_mean, deff, z_alpha,
    * z_power, mde_abs, mde_rel, n_needed, m_needed) — `n_needed` total
    * SUBJECTS, `m_needed` total CLUSTERS (at the observed mean cluster
    * size) for `targetRelLift` at this α/power. */
  def mdeTwoSampleClustered(
      df: DataFrame, valueCol: String, clusterCol: String,
      alpha: Double = 0.05, power: Double = 0.8, split: Double = 0.5,
      targetRelLift: Double = 0.02): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(power >= 0.5 && power < 1,
      s"power must be in [0.5, 1) (the probit approximation's domain), got $power")
    require(split > 0 && split < 1, s"split must be in (0,1), got $split")
    require(targetRelLift > 0, s"targetRelLift must be positive, got $targetRelLift")
    val v = col(valueCol).cast("double")
    val grid = df.groupBy(col(clusterCol).cast("string").as("cl"))
      .agg(count(v).as("n_c"), sum(v).as("s_c"), sum(v * v).as("ss_c"))
    val agg = grid.agg(
      sum(col("n_c")).as("n"), count(lit(1)).as("m"),
      sum(col("s_c")).as("sy"), sum(col("ss_c")).as("syy"),
      sum(col("s_c") * col("s_c")).as("cyy"),
      sum(col("s_c") * col("n_c")).as("cyn"),
      sum(col("n_c") * col("n_c")).as("nn"))
    val mean = col("sy") / col("n")
    val variance = (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)
    // a single cluster has no between-cluster variance to estimate —
    // the m−1 denominator is the refusal, surfaced by name; the guard
    // lives INSIDE the reported column so pruning can never drop it
    val varClusterMean = when(col("m") < 2, raise_error(lit(
        "mdeTwoSampleClustered needs at least 2 clusters — one cluster " +
          "has no between-cluster variance (check the cluster column)")))
      .otherwise(col("m").cast("double") / (col("m") - 1) *
        (col("cyy") - lit(2.0) * mean * col("cyn") + mean * mean * col("nn")) /
        (col("n") * col("n")))
    val zA = probitUpper(lit(alpha / 2.0))
    val zB = probitUpper(lit(1.0 - power))
    val designVar = varClusterMean * (lit(1.0 / split) + lit(1.0 / (1.0 - split)))
    val mdeAbs = (zA + zB) * sqrt(designVar)
    val nNeeded = when(col("mean") > 0,
      ceil((col("z_alpha") + col("z_power")) * (col("z_alpha") + col("z_power")) *
        col("n") * col("var_cluster_mean") *
        lit(1.0 / split + 1.0 / (1.0 - split)) /
        ((lit(targetRelLift) * col("mean")) * (lit(targetRelLift) * col("mean"))))
        .cast("long"))
    agg
      .select(
        col("n"), col("m"), mean.as("mean"), variance.as("variance"),
        varClusterMean.as("var_cluster_mean"),
        (varClusterMean * col("n") / variance).as("deff"),
        zA.as("z_alpha"), zB.as("z_power"),
        mdeAbs.as("mde_abs"))
      .withColumn("mde_rel", when(col("mean") > 0, col("mde_abs") / col("mean")))
      .withColumn("n_needed", nNeeded)
      .withColumn("m_needed",
        when(col("mean") > 0,
          ceil(col("n_needed") * col("m") / col("n")).cast("long")))
  }
}
