package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED — Controlled-experiment Using Pre-Existing Data (Deng, Xu,
  * Kohavi & Walker 2013): regression-adjusted A/B analysis. The raw
  * treatment-effect estimator Δ = ȳ_A − ȳ_B carries all of the metric's
  * between-subject variance; most of that variance was already there
  * BEFORE the experiment and is visible in a pre-period covariate x
  * (last month's activity, spend, visit count). CUPED subtracts the
  * predictable part: with θ = cov(x, y)/var(x) (pooled — θ must not be
  * fit per arm or the estimator reintroduces bias), the adjusted metric
  * y' = y − θ·(x − x̄) has the SAME expected treatment effect
  * (randomization makes x independent of assignment, so the adjustment
  * term's arm means cancel in expectation) but variance shrunk by the
  * squared correlation: var(y') = var(y)·(1 − ρ²). A platform running
  * at ρ ≈ 0.7 needs half the sample for the same power.
  *
  * Scale shape: ONE aggregation over the subject frame computes every
  * moment (n, Σx, Σy, Σx², Σy², Σxy per arm — conditional sums, so one
  * hash aggregate with map-side partials and a single output row);
  * everything else is closed-form driver arithmetic on that row. No
  * second pass, no per-subject residual materialization.
  *
  * Two-arm contract enforced like [[SequentialTest.obfMonitor]]: a
  * third arm would silently pool into "control" and misreport both
  * estimators.
  *
  * Returns one row: (n_a, n_b, theta, delta_raw, se_raw, delta_cuped,
  * se_cuped, var_reduction) where se is the two-sample Welch standard
  * error of the corresponding estimator and var_reduction =
  * 1 − se²_cuped/se²_raw (≥ 0 whenever x correlates with y; exactly 0
  * when θ = 0). */
object Cuped {

  def cuped(
      subjects: DataFrame, armCol: String, yCol: String, xCol: String,
      focal: String): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val arm = col(armCol).cast("string")
    val y = col(yCol).cast("double")
    val x = col(xCol).cast("double")
    val isA = arm === focal
    def side(cond: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      sum(when(cond, e).otherwise(lit(0.0)))
    val row = subjects.agg(
      count_distinct(arm).as("arms"),
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(!isA, 1L).otherwise(0L)).as("n_b"),
      side(isA, x).as("sx_a"), side(isA, y).as("sy_a"),
      side(isA, x * x).as("sxx_a"), side(isA, y * y).as("syy_a"),
      side(isA, x * y).as("sxy_a"),
      side(!isA, x).as("sx_b"), side(!isA, y).as("sy_b"),
      side(!isA, x * x).as("sxx_b"), side(!isA, y * y).as("syy_b"),
      side(!isA, x * y).as("sxy_b")).head()
    require(row.getLong(0) == 2L,
      s"cuped is a two-arm analysis; found ${row.getLong(0)} arm(s)")
    val (nA, nB) = (row.getLong(1), row.getLong(2))
    require(nA >= 2 && nB >= 2, s"need ≥2 subjects per arm, got A=$nA B=$nB")
    val Seq(sxA, syA, sxxA, syyA, sxyA, sxB, syB, sxxB, syyB, sxyB) =
      (3 to 12).map(row.getDouble)
    val n = (nA + nB).toDouble
    val (sx, sy, sxx, sxy) = (sxA + sxB, syA + syB, sxxA + sxxB, sxyA + sxyB)
    val mx = sx / n
    // pooled θ; a constant pre-period covariate (var x = 0) carries no
    // information — θ = 0 and CUPED degrades to the raw estimator
    val varXn = sxx - sx * sx / n
    val theta = if (varXn > 0.0) (sxy - sx * sy / n) / varXn else 0.0
    def armStats(nn: Long, sx0: Double, sy0: Double, sxx0: Double,
        syy0: Double, sxy0: Double): (Double, Double, Double, Double) = {
      val m = nn.toDouble
      val meanY = sy0 / m
      val meanX = sx0 / m
      val varY = (syy0 - sy0 * sy0 / m) / (m - 1)
      val varX = (sxx0 - sx0 * sx0 / m) / (m - 1)
      val covXY = (sxy0 - sx0 * sy0 / m) / (m - 1)
      // var of y' = y − θ(x − x̄) within the arm
      val varAdj = varY - 2 * theta * covXY + theta * theta * varX
      (meanY, meanX, varY, varAdj)
    }
    val (myA, mxA, varYA, varAdjA) = armStats(nA, sxA, syA, sxxA, syyA, sxyA)
    val (myB, mxB, varYB, varAdjB) = armStats(nB, sxB, syB, sxxB, syyB, sxyB)
    val deltaRaw = myA - myB
    val deltaCuped = (myA - theta * (mxA - mx)) - (myB - theta * (mxB - mx))
    val seRaw = math.sqrt(varYA / nA + varYB / nB)
    val seCuped = math.sqrt(varAdjA / nA + varAdjB / nB)
    val varReduction =
      if (seRaw > 0.0) 1.0 - (seCuped * seCuped) / (seRaw * seRaw) else 0.0
    Seq((nA, nB, theta, deltaRaw, seRaw, deltaCuped, seCuped, varReduction))
      .toDF("n_a", "n_b", "theta", "delta_raw", "se_raw",
        "delta_cuped", "se_cuped", "var_reduction")
  }

  /** MULTI-covariate CUPED (regression adjustment with SEVERAL
    * pre-period metrics): θ = VarX⁻¹·Cov(X, y) fit POOLED over p
    * covariates, y' = y − θᵀ(x − x̄) — strictly more variance removed
    * than any single covariate alone (the single-x estimator is the
    * p = 1 special case, spec-pinned identical). Same scale shape as
    * [[cuped]]: ONE conditional aggregation (p + p(p+1)/2 + p + 2
    * moment columns per arm, single row out), then a p×p driver solve.
    * COLLINEAR or constant covariates make VarX singular — that is a
    * covariate-set bug, not a data property, so it REFUSES (the p = 1
    * fall-back-to-raw convention does not generalize: θ would be
    * arbitrary along the null space, silently changing the estimate).
    *
    * Returns one row: (n_a, n_b, theta: array<double>, delta_raw,
    * se_raw, delta_cuped, se_cuped, var_reduction). */
  def cupedMulti(
      subjects: DataFrame, armCol: String, yCol: String, xCols: Seq[String],
      focal: String): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val p = xCols.length
    require(p >= 1, "cupedMulti needs at least one covariate")
    val arm = col(armCol).cast("string")
    val y = col(yCol).cast("double")
    val xs = xCols.map(c => col(c).cast("double"))
    val isA = arm === focal
    val pairs = (for { k <- 0 until p; l <- k until p } yield (k, l)).toArray
    def side(cond: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      sum(when(cond, e).otherwise(lit(0.0)))
    def armAggs(cond: org.apache.spark.sql.Column, tag: String) =
      Seq(side(cond, y).as(s"sy_$tag"), side(cond, y * y).as(s"syy_$tag")) ++
        xs.zipWithIndex.map { case (x, k) => side(cond, x).as(s"sx${k}_$tag") } ++
        pairs.toSeq.map { case (k, l) =>
          side(cond, xs(k) * xs(l)).as(s"sxx${k}_${l}_$tag")
        } ++
        xs.zipWithIndex.map { case (x, k) => side(cond, x * y).as(s"sxy${k}_$tag") }
    val aggs =
      Seq(count_distinct(arm).as("arms"),
        sum(when(isA, 1L).otherwise(0L)).as("n_a"),
        sum(when(!isA, 1L).otherwise(0L)).as("n_b")) ++
        armAggs(isA, "a") ++ armAggs(!isA, "b")
    val row = subjects.agg(aggs.head, aggs.tail: _*).head()
    require(row.getLong(0) == 2L,
      s"cupedMulti is a two-arm analysis; found ${row.getLong(0)} arm(s)")
    val (nA, nB) = (row.getLong(1), row.getLong(2))
    require(nA >= 2 && nB >= 2, s"need ≥2 subjects per arm, got A=$nA B=$nB")
    val q = pairs.length
    val perArm = 2 + p + q + p
    def get(tagBase: Int, i: Int): Double = row.getDouble(3 + tagBase * perArm + i)
    def syT(t: Int) = get(t, 0); def syyT(t: Int) = get(t, 1)
    def sxT(t: Int, k: Int) = get(t, 2 + k)
    def sxxT(t: Int, i: Int) = get(t, 2 + p + i)
    def sxyT(t: Int, k: Int) = get(t, 2 + p + q + k)
    val pIdx = Array.fill(p, p)(0)
    pairs.zipWithIndex.foreach { case ((k, l), i) => pIdx(k)(l) = i; pIdx(l)(k) = i }
    val n = (nA + nB).toDouble
    val sy = syT(0) + syT(1)
    val sx = Array.tabulate(p)(k => sxT(0, k) + sxT(1, k))
    val sxx = Array.tabulate(q)(i => sxxT(0, i) + sxxT(1, i))
    val sxy = Array.tabulate(p)(k => sxyT(0, k) + sxyT(1, k))
    // pooled (n-scaled) VarX and Cov(X,y); the common factor cancels in θ
    val a = Array.tabulate(p, p)((k, l) => sxx(pIdx(k)(l)) - sx(k) * sx(l) / n)
    val b = Array.tabulate(p)(k => sxy(k) - sx(k) * sy / n)
    // tiny Gaussian elimination with partial pivoting; singular refuses
    val theta = {
      val m = a.map(_.clone()); val v = b.clone()
      var c = 0
      while (c < p) {
        var piv = c
        var r = c + 1
        while (r < p) { if (math.abs(m(r)(c)) > math.abs(m(piv)(c))) piv = r; r += 1 }
        require(math.abs(m(piv)(c)) > 1e-12 * (1.0 + n),
          s"singular pre-period covariance — covariate '${xCols(c)}' is constant " +
            "or collinear with the others; drop it (an arbitrary null-space θ " +
            "would silently change the estimate)")
        val t0 = m(c); m(c) = m(piv); m(piv) = t0
        val tv = v(c); v(c) = v(piv); v(piv) = tv
        var r2 = c + 1
        while (r2 < p) {
          val f = m(r2)(c) / m(c)(c)
          var cc = c
          while (cc < p) { m(r2)(cc) -= f * m(c)(cc); cc += 1 }
          v(r2) -= f * v(c)
          r2 += 1
        }
        c += 1
      }
      val out = Array.fill(p)(0.0)
      var r3 = p - 1
      while (r3 >= 0) {
        var s = v(r3)
        var cc = r3 + 1
        while (cc < p) { s -= m(r3)(cc) * out(cc); cc += 1 }
        out(r3) = s / m(r3)(r3)
        r3 -= 1
      }
      out
    }
    val mxPooled = Array.tabulate(p)(k => sx(k) / n)
    def armStats(t: Int, nn: Long): (Double, Array[Double], Double, Double) = {
      val m = nn.toDouble
      val meanY = syT(t) / m
      val meanX = Array.tabulate(p)(k => sxT(t, k) / m)
      val varY = (syyT(t) - syT(t) * syT(t) / m) / (m - 1)
      val covXY = Array.tabulate(p)(k => (sxyT(t, k) - sxT(t, k) * syT(t) / m) / (m - 1))
      val varX = Array.tabulate(p, p)((k, l) =>
        (sxxT(t, pIdx(k)(l)) - sxT(t, k) * sxT(t, l) / m) / (m - 1))
      var adj = varY
      var k = 0
      while (k < p) {
        adj -= 2 * theta(k) * covXY(k)
        var l = 0
        while (l < p) { adj += theta(k) * theta(l) * varX(k)(l); l += 1 }
        k += 1
      }
      (meanY, meanX, varY, adj)
    }
    val (myA, mxA, varYA, varAdjA) = armStats(0, nA)
    val (myB, mxB, varYB, varAdjB) = armStats(1, nB)
    val deltaRaw = myA - myB
    val adjTerm = (mx: Array[Double]) =>
      (0 until p).map(k => theta(k) * (mx(k) - mxPooled(k))).sum
    val deltaCuped = (myA - adjTerm(mxA)) - (myB - adjTerm(mxB))
    val seRaw = math.sqrt(varYA / nA + varYB / nB)
    val seCuped = math.sqrt(varAdjA / nA + varAdjB / nB)
    val varReduction =
      if (seRaw > 0.0) 1.0 - (seCuped * seCuped) / (seRaw * seRaw) else 0.0
    Seq((nA, nB, theta.toSeq, deltaRaw, seRaw, deltaCuped, seCuped, varReduction))
      .toDF("n_a", "n_b", "theta", "delta_raw", "se_raw",
        "delta_cuped", "se_cuped", "var_reduction")
  }
}
