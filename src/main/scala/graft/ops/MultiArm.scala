package graft.ops

import org.apache.spark.sql.DataFrame
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
  * p the two-sided normal tail (fixed A&S 7.1.26 polynomial — BY CALL
  * into the engine's one implementation), and q_bh the step-up
  * q-value: q_(i) = min_{j ≥ i} p_(j)·m/j over the m = k−1 ordered
  * comparisons (monotone by construction; discovery ⇔ q ≤ fdr, which
  * is exactly the BH rejection set).
  *
  * Scale shape: ONE keyed aggregation to the arm grid (k rows), the
  * control row broadcast back in-plan (no collect of statistics), and
  * the BH fold a bounded window over the (k−1)-row frame
  * ([[graft.core.Windows]] discipline — the grid is design-sized).
  * Refusals by name: a missing control, fewer than two arms, an arm
  * too thin for a sample variance, and an arm column with more than 64
  * levels (that is a segmentation, not an experiment — the check
  * collects at most 65 arm names). */
object MultiArm {

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
    val arm = col(armCol).cast("string")
    val y = col(yCol).cast("double")
    val x = xCol.map(c => col(c).cast("double")).getOrElse(lit(0.0))
    val grid = subjects.groupBy(arm.as("arm"))
      .agg(count(lit(1)).as("n"), sum(y).as("s"), sum(y * y).as("ss"),
        sum(x).as("sx"), sum(x * x).as("sxx"), sum(x * y).as("sxy"))
      .localCheckpoint() // k rows; reused by the guard and both join sides
    val arms = grid.select("arm").limit(65).collect().map(_.getString(0)).toSeq
    require(arms.size <= 64,
      s"arm column '$armCol' has more than 64 levels — that is a " +
        "segmentation, not an experiment (check the column)")
    require(arms.size >= 2,
      s"multi-arm report needs at least control + one treatment; found " +
        s"${arms.size} arm(s): ${arms.sorted.mkString(", ")}")
    require(arms.contains(control),
      s"control arm '$control' not present; arms are ${arms.sorted.mkString(", ")}")
    val thin = grid.filter(col("n") < 2).select("arm").limit(65)
      .collect().map(_.getString(0))
    require(thin.isEmpty,
      s"arm(s) too thin for a sample variance (n < 2): ${thin.sorted.mkString(", ")}")
    def varS(ss: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) = (ss - s * s / n) / (n - lit(1.0))
    val ctrl = grid.filter(col("arm") === control).select(
      col("n").cast("double").as("n_c"), col("s").as("s_c"), col("ss").as("ss_c"),
      col("sx").as("sx_c"), col("sxx").as("sxx_c"), col("sxy").as("sxy_c"))
    val t = grid.filter(col("arm") =!= control)
      .crossJoin(broadcast(ctrl))
    val nT = col("n").cast("double")
    val mT = col("s") / nT
    val mC = col("s_c") / col("n_c")
    val delta = mT - mC
    val se = sqrt(varS(col("ss"), col("s"), nT) / nT +
      varS(col("ss_c"), col("s_c"), col("n_c")) / col("n_c"))
    val z = when(se > 0.0, delta / se).otherwise(lit(0.0))
    val raw = Seq(
      col("arm"), col("n"),
      mT.as("mean"), delta.as("delta"), se.as("se"), z.as("z"),
      graft.queries.Stats.pNormTwoSided(z).as("p"))
    val cuped: Seq[org.apache.spark.sql.Column] = xCol match {
      case None => Seq.empty
      case Some(_) =>
        // pair-pooled θ: total (not per-arm) covariance over this
        // contrast's union — Cuped.cuped's estimator on the pair
        val nn = nT + col("n_c")
        val sxP = col("sx") + col("sx_c")
        val syP = col("s") + col("s_c")
        val sxxP = col("sxx") + col("sxx_c")
        val sxyP = col("sxy") + col("sxy_c")
        val varXn = sxxP - sxP * sxP / nn
        val theta = when(varXn > 0.0, (sxyP - sxP * syP / nn) / varXn)
          .otherwise(lit(0.0))
        def adjVar(n: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column,
            ss: org.apache.spark.sql.Column, sx: org.apache.spark.sql.Column,
            sxx: org.apache.spark.sql.Column, sxy: org.apache.spark.sql.Column) = {
          val vy = (ss - s * s / n) / (n - lit(1.0))
          val vx = (sxx - sx * sx / n) / (n - lit(1.0))
          val cxy = (sxy - sx * s / n) / (n - lit(1.0))
          vy - lit(2.0) * theta * cxy + theta * theta * vx
        }
        val mxT = col("sx") / nT
        val mxC = col("sx_c") / col("n_c")
        val mx = sxP / nn
        val deltaC = (mT - theta * (mxT - mx)) - (mC - theta * (mxC - mx))
        val seC = sqrt(
          adjVar(nT, col("s"), col("ss"), col("sx"), col("sxx"), col("sxy")) / nT +
          adjVar(col("n_c"), col("s_c"), col("ss_c"), col("sx_c"), col("sxx_c"),
            col("sxy_c")) / col("n_c"))
        val zC = when(seC > 0.0, deltaC / seC).otherwise(lit(0.0))
        Seq(theta.as("theta"), deltaC.as("delta_cuped"), seC.as("se_cuped"),
          zC.as("z_cuped"), graft.queries.Stats.pNormTwoSided(zC).as("p_cuped"))
    }
    val scored = t.select(raw ++ cuped: _*)
    // BH step-up over the m ordered comparisons: rank ascending by the
    // decision-grade p (adjusted when a covariate is declared),
    // q_(i) = min over j >= i of p_(j)*m/j, capped at 1
    val pRank = if (xCol.isEmpty) col("p") else col("p_cuped")
    val byP = graft.core.Windows.bounded(pRank, col("arm"))
    val tail = byP.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val full = byP.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored
      .withColumn("k", row_number().over(byP).cast("long"))
      .withColumn("m", count(lit(1)).over(full))
      .withColumn("q_bh",
        least(lit(1.0), min(pRank * col("m") / col("k")).over(tail)))
      .withColumn("discovery", col("q_bh") <= lit(fdr))
      .drop("m")
  }
}
