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
}
