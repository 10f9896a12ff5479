package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Bayesian A/B analysis for two-arm conversion experiments: Beta-Binomial
  * posteriors and the decision quantities a real experimentation platform
  * reports alongside the frequentist family (q269 proportions, q340
  * sequential, q346 CUPED) — P(focal beats control) and the EXPECTED LOSS
  * of shipping each arm, the quantity Bayesian ship/no-ship rules
  * threshold on (ship focal when E[loss_focal] < ε).
  *
  * Scale shape: ONE keyed aggregation over the subject frame (per arm:
  * n, conversions — two rows out), then closed-form driver arithmetic.
  * `method = "exact"` evaluates Evan Miller's closed-form sum
  * P(p_B > p_A) = Σ_{i<α_B} B(α_A+i, β_A+β_B) / ((β_B+i)·B(1+i,β_B)·B(α_A,β_A))
  * in log space (lgamma via commons-math3, shipped with Spark) — EXACT
  * for integer posterior α, so a DuckDB oracle can replay it term for
  * term with generate_series + lgamma. The sum length is the posterior α
  * (prior + conversions): driver FLOPS bounded by `maxExact` under the
  * declared-judgement discipline — at billions of conversions the sum is
  * the wrong tool and the fit REFUSES, naming `method = "normal"`: the
  * moment-matched normal approximation (Φ over the difference of Beta
  * means/variances, A&S 7.1.26 — the same fixed polynomial the p-value
  * family uses), whose error at that scale is far below any decision
  * threshold and whose cost is O(1) after the same single aggregation.
  *
  * Expected losses come from the same h-sum via the mean-shift identity
  * E[p·1{p>q}] = mean(p)·P(p⁺ > q) with p⁺ the α+1-shifted Beta, so
  * loss_ctrl − loss_focal ≡ E[p_f] − E[p_c] (spec-pinned identity).
  * Priors are integer (default uniform Beta(1,1)) to keep the exact sum
  * exact. */
object BayesAb {

  /** Φ via Abramowitz-Stegun 7.1.26 (|error| < 7.5e-8) — the SAME fixed
    * polynomial as `Stats.pNormTwoSided`, spelled scalar-side. */
  private def phi(z: Double): Double = {
    val a = math.abs(z)
    val t = 1.0 / (1.0 + 0.2316419 * a)
    val tail = math.exp(-a * a / 2.0) / math.sqrt(2.0 * math.Pi) *
      (0.319381530 * t - 0.356563782 * t * t + 1.781477937 * t * t * t -
        1.821255978 * t * t * t * t + 1.330274429 * t * t * t * t * t)
    if (z >= 0) 1.0 - tail else tail
  }

  private def lgamma(x: Double): Double =
    org.apache.commons.math3.special.Gamma.logGamma(x)

  private def lbeta(a: Double, b: Double): Double =
    lgamma(a) + lgamma(b) - lgamma(a + b)

  /** P(p_B > p_A) for p_B ~ Beta(aB, bB), p_A ~ Beta(aA, bA), aB a
    * positive integer — Evan Miller's exact finite sum, in log space. */
  private def hExact(aB: Long, bB: Double, aA: Double, bA: Double): Double = {
    var s = 0.0
    var i = 0L
    while (i < aB) {
      s += math.exp(lbeta(aA + i, bA + bB) - math.log(bB + i) -
        lbeta(1.0 + i, bB) - lbeta(aA, bA))
      i += 1
    }
    s
  }

  /** One row: counts, posterior means, lift, P(focal beats control), and
    * both arms' expected losses. `convCol` must be 0/1 per subject;
    * exactly two distinct arms (the [[SequentialTest.obfMonitor]]
    * contract). */
  def betaBinomial(
      subjects: DataFrame, armCol: String, convCol: String, focal: String,
      priorAlpha: Long = 1L, priorBeta: Long = 1L,
      method: String = "exact", maxExact: Long = 2000000L): DataFrame = {
    require(method == "exact" || method == "normal",
      s"method must be 'exact' or 'normal', got '$method'")
    require(priorAlpha >= 1 && priorBeta >= 1,
      "priors must be positive integers (the exact sum needs integer posterior alpha)")
    val spark = subjects.sparkSession
    import spark.implicits._
    val perArm = subjects.groupBy(col(armCol).cast("string").as("arm")).agg(
      count(lit(1)).as("n"),
      sum(col(convCol).cast("long")).as("s"))
      .limit(3).collect() // bounded probe: a wrong (high-cardinality)
    // arm column must not collect its whole grid before refusing
    require(perArm.length == 2,
      s"bayesAb is a two-arm analysis, got ${
        if (perArm.length >= 3) "3+" else perArm.length.toString} arms" +
        (if (perArm.length < 3) s": ${perArm.map(_.getString(0)).sorted.mkString(", ")}"
         else ""))
    val byArm = perArm.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(byArm.contains(focal), s"focal arm '$focal' not present in $armCol")
    byArm.foreach { case (arm, (n, s)) =>
      require(s >= 0 && s <= n,
        s"convCol must be 0/1 per subject: arm '$arm' sums to $s over $n subjects — " +
          "a count-valued metric belongs in the t/CUPED family, not a Beta-Binomial")
    }
    val (nF, sF) = byArm(focal)
    val (nC, sC) = byArm.find(_._1 != focal).get._2
    val (aF, bF) = (priorAlpha + sF, (priorBeta + nF - sF).toDouble)
    val (aC, bC) = (priorAlpha + sC, (priorBeta + nC - sC).toDouble)
    val muF = aF / (aF + bF); val muC = aC / (aC + bC)
    val (prob, lossF, lossC) =
      if (method == "exact") {
        require(3 * aF + 2 * aC + 2 <= maxExact,
          s"exact Beta sums need ${3 * aF + 2 * aC + 2} terms > maxExact=$maxExact — " +
            "the driver arithmetic is bounded by declared judgement; at this many " +
            "conversions use method = \"normal\" (its error is far below any " +
            "decision threshold) or raise the cap knowingly")
        val p = hExact(aF, bF, aC, bC)
        // E[max(p_c − p_f, 0)] and E[max(p_f − p_c, 0)] via the
        // mean-shift identity — four more h-sums of the same lengths
        val lf = muC * hExact(aC + 1, bC, aF, bF) - muF * hExact(aC, bC, aF + 1, bF)
        val lc = muF * hExact(aF + 1, bF, aC, bC) - muC * hExact(aF, bF, aC + 1, bC)
        (p, lf, lc)
      } else {
        val vF = aF * bF / ((aF + bF) * (aF + bF) * (aF + bF + 1.0))
        val vC = aC * bC / ((aC + bC) * (aC + bC) * (aC + bC + 1.0))
        val sd = math.sqrt(vF + vC)
        val m = muF - muC
        // E[max(X,0)] for X ~ N(m, sd²): m·Φ(m/sd) + sd·φ(m/sd)
        def relu(mean: Double): Double =
          mean * phi(mean / sd) + sd * math.exp(-mean * mean / (2 * sd * sd)) /
            math.sqrt(2.0 * math.Pi)
        (phi(m / sd), relu(-m), relu(m))
      }
    Seq((nF, sF, nC, sC, muF, muC, muF - muC, prob, lossF, lossC))
      .toDF("n_focal", "conv_focal", "n_ctrl", "conv_ctrl",
        "post_mean_focal", "post_mean_ctrl", "lift",
        "prob_focal_beats", "exp_loss_focal", "exp_loss_ctrl")
  }
}
