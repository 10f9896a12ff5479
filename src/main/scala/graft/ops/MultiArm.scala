package graft.ops

import org.apache.spark.sql.DataFrame
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
}
