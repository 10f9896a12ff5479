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
  * when θ = 0).
  *
  * CLUSTER-randomized designs (`clusterCol`): when assignment happens
  * ABOVE the subject (geo, store, account), subjects within a cluster
  * are correlated and the iid Welch SE is overconfident — the same
  * dishonesty q357's Cox sandwich fixes. With `clusterCol` the point
  * estimates are UNCHANGED but the output adds (m_a, m_b,
  * robust_se_raw, robust_se_cuped): the cluster-robust variance of an
  * arm mean folds per-cluster SUMS once —
  * V = m/(m−1)·Σ_c (T_c − n_c·t̄)² / n² with T_c the cluster sum of
  * the (adjusted) metric — exactly the Liang-Zeger one-way estimator,
  * which with singleton clusters reduces to the iid variance EXACTLY
  * (spec-pinned). Scale shape: ONE keyed aggregation to the cluster
  * grid carrying every within-cluster moment, then ONE global
  * aggregation over it (the subject-level moments are sums of cluster
  * sums, so θ and the iid SEs ride the same two passes); the cluster
  * grid never collects. Assignment integrity is enforced: a cluster
  * seen in BOTH arms is a design violation (that is what
  * cluster-randomized means) and refuses by name. `var_reduction`
  * stays the iid ratio — it reports the metric correlation ρ², a
  * property of the adjustment, not of the clustering. */
object Cuped {

  def cuped(
      subjects: DataFrame, armCol: String, yCol: String, xCol: String,
      focal: String, clusterCol: Option[String] = None): DataFrame = {
    clusterCol match {
      case Some(cc) => return cupedClustered(subjects, armCol, yCol, xCol, focal, cc)
      case None => ()
    }
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

  /** The clustered path of [[cuped]]: two aggregations (cluster grid,
    * then global), closed-form driver arithmetic on ONE row. */
  private def cupedClustered(
      subjects: DataFrame, armCol: String, yCol: String, xCol: String,
      focal: String, clusterCol: String): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val y = col(yCol).cast("double")
    val x = col(xCol).cast("double")
    // cluster grid: every within-cluster moment + the arm (constant per
    // cluster in a valid cluster-randomized design; violations counted)
    val grid = subjects
      .groupBy(col(clusterCol).cast("string").as("cl"))
      .agg(
        count_distinct(col(armCol).cast("string")).as("arms_c"),
        max(col(armCol).cast("string")).as("arm_c"),
        count(lit(1)).as("n_c"),
        sum(y).as("sy"), sum(x).as("sx"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
    val isA = col("arm_c") === focal
    def side(cond: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      sum(when(cond, e).otherwise(lit(0.0)))
    def armAggs(cond: org.apache.spark.sql.Column, tag: String) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"m_$tag"),
      side(cond, col("n_c")).cast("long").as(s"n_$tag"),
      side(cond, col("n_c") * col("n_c")).as(s"nn_$tag"),
      side(cond, col("sy")).as(s"sy_$tag"),
      side(cond, col("sx")).as(s"sx_$tag"),
      side(cond, col("sxx")).as(s"sxx_$tag"),
      side(cond, col("syy")).as(s"syy_$tag"),
      side(cond, col("sxy")).as(s"sxy_$tag"),
      side(cond, col("sy") * col("sy")).as(s"cyy_$tag"),
      side(cond, col("sx") * col("sx")).as(s"cxx_$tag"),
      side(cond, col("sy") * col("sx")).as(s"cyx_$tag"),
      side(cond, col("sy") * col("n_c")).as(s"cyn_$tag"),
      side(cond, col("sx") * col("n_c")).as(s"cxn_$tag"))
    val aggs = Seq(
      max(col("arms_c")).as("max_arms_c"),
      count_distinct(col("arm_c")).as("arms")) ++ armAggs(isA, "a") ++ armAggs(!isA, "b")
    val row = grid.agg(aggs.head, aggs.tail: _*).head()
    if (row.getAs[Long]("max_arms_c") > 1L) {
      val bad = grid.filter(col("arms_c") > 1).select("cl").limit(3)
        .collect().map(_.getString(0))
      throw new IllegalArgumentException(
        s"cluster(s) ${bad.mkString(", ")} appear in BOTH arms — cluster-robust " +
          "inference assumes assignment BY cluster; fix the randomization unit " +
          "or analyze at the subject level knowingly")
    }
    require(row.getAs[Long]("arms") == 2L,
      s"cuped is a two-arm analysis; found ${row.getAs[Long]("arms")} arm(s)")
    def g(n: String): Double = row.getAs[Double](n)
    val (nA, nB) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    val (mA, mB) = (row.getAs[Long]("m_a"), row.getAs[Long]("m_b"))
    require(nA >= 2 && nB >= 2, s"need >=2 subjects per arm, got A=$nA B=$nB")
    require(mA >= 2 && mB >= 2,
      s"cluster-robust variance needs >=2 clusters per arm, got A=$mA B=$mB")
    val n = (nA + nB).toDouble
    val (sx, sy) = (g("sx_a") + g("sx_b"), g("sy_a") + g("sy_b"))
    val sxx = g("sxx_a") + g("sxx_b")
    val sxy = g("sxy_a") + g("sxy_b")
    val mx = sx / n
    val varXn = sxx - sx * sx / n
    val theta = if (varXn > 0.0) (sxy - sx * sy / n) / varXn else 0.0
    // iid Welch SEs: identical arithmetic to the unclustered path (the
    // subject-level moments are sums of cluster sums)
    def armStats(t: String, nn: Long): (Double, Double, Double, Double) = {
      val m = nn.toDouble
      val meanY = g(s"sy_$t") / m
      val meanX = g(s"sx_$t") / m
      val varY = (g(s"syy_$t") - g(s"sy_$t") * g(s"sy_$t") / m) / (m - 1)
      val varX = (g(s"sxx_$t") - g(s"sx_$t") * g(s"sx_$t") / m) / (m - 1)
      val covXY = (g(s"sxy_$t") - g(s"sx_$t") * g(s"sy_$t") / m) / (m - 1)
      (meanY, meanX, varY, varY - 2 * theta * covXY + theta * theta * varX)
    }
    val (myA, mxA, varYA, varAdjA) = armStats("a", nA)
    val (myB, mxB, varYB, varAdjB) = armStats("b", nB)
    val deltaRaw = myA - myB
    val deltaCuped = (myA - theta * (mxA - mx)) - (myB - theta * (mxB - mx))
    val seRaw = math.sqrt(varYA / nA + varYB / nB)
    val seCuped = math.sqrt(varAdjA / nA + varAdjB / nB)
    val varReduction =
      if (seRaw > 0.0) 1.0 - (seCuped * seCuped) / (seRaw * seRaw) else 0.0
    // cluster-robust arm-mean variance of t = y − θ·x (the x̄ shift is a
    // constant): with T_c = sy_c − θ·sx_c,
    // V = m/(m−1)·(ΣT² − 2t̄·ΣTn + t̄²·Σn²)/n²
    def robustVar(t: String, nn: Long, mm: Long, th: Double): Double = {
      val tt2 = g(s"cyy_$t") - 2 * th * g(s"cyx_$t") + th * th * g(s"cxx_$t")
      val ttn = g(s"cyn_$t") - th * g(s"cxn_$t")
      val tbar = (g(s"sy_$t") - th * g(s"sx_$t")) / nn
      mm.toDouble / (mm - 1) *
        (tt2 - 2 * tbar * ttn + tbar * tbar * g(s"nn_$t")) / (nn.toDouble * nn)
    }
    val robustSeRaw = math.sqrt(robustVar("a", nA, mA, 0.0) + robustVar("b", nB, mB, 0.0))
    val robustSeCuped =
      math.sqrt(robustVar("a", nA, mA, theta) + robustVar("b", nB, mB, theta))
    Seq((nA, nB, mA, mB, theta, deltaRaw, seRaw, robustSeRaw, deltaCuped,
      seCuped, robustSeCuped, varReduction))
      .toDF("n_a", "n_b", "m_a", "m_b", "theta", "delta_raw", "se_raw",
        "robust_se_raw", "delta_cuped", "se_cuped", "robust_se_cuped",
        "var_reduction")
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
    * se_raw, delta_cuped, se_cuped, var_reduction). With `clusterCol`
    * the [[cuped]] cluster-robust contract applies verbatim (extra
    * m_a/m_b/robust_se_raw/robust_se_cuped columns, T_c = sy_c −
    * θᵀsx_c in the cluster fold, both-arm clusters refuse). */
  def cupedMulti(
      subjects: DataFrame, armCol: String, yCol: String, xCols: Seq[String],
      focal: String, clusterCol: Option[String] = None): DataFrame = {
    clusterCol match {
      case Some(cc) =>
        return cupedMultiClustered(subjects, armCol, yCol, xCols, focal, cc)
      case None => ()
    }
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
    val theta = solvePsd(a, b, xCols, n)
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

  /** The clustered path of [[cupedMulti]]: the [[cupedClustered]] shape
    * with vector θ — cluster grid carries per-cluster sums of every
    * covariate product, the global pass folds both the subject-level
    * moments (θ solve + iid SEs) and the cluster-sum cross moments the
    * robust fold needs. */
  private def cupedMultiClustered(
      subjects: DataFrame, armCol: String, yCol: String, xCols: Seq[String],
      focal: String, clusterCol: String): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val p = xCols.length
    require(p >= 1, "cupedMulti needs at least one covariate")
    val y = col(yCol).cast("double")
    val xs = xCols.map(c => col(c).cast("double"))
    val pairs = (for { k <- 0 until p; l <- k until p } yield (k, l)).toArray
    val pIdx = Array.fill(p, p)(0)
    pairs.zipWithIndex.foreach { case ((k, l), i) => pIdx(k)(l) = i; pIdx(l)(k) = i }
    val gridAggs =
      Seq(
        count_distinct(col(armCol).cast("string")).as("arms_c"),
        max(col(armCol).cast("string")).as("arm_c"),
        count(lit(1)).as("n_c"),
        sum(y).as("sy"), sum(y * y).as("syy")) ++
        xs.zipWithIndex.map { case (x, k) => sum(x).as(s"sx$k") } ++
        pairs.toSeq.map { case (k, l) => sum(xs(k) * xs(l)).as(s"sxx${k}_$l") } ++
        xs.zipWithIndex.map { case (x, k) => sum(x * y).as(s"sxy$k") }
    val grid = subjects.groupBy(col(clusterCol).cast("string").as("cl"))
      .agg(gridAggs.head, gridAggs.tail: _*)
    val isA = col("arm_c") === focal
    def side(cond: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      sum(when(cond, e).otherwise(lit(0.0)))
    def armAggs(cond: org.apache.spark.sql.Column, tag: String) =
      Seq(
        sum(when(cond, 1L).otherwise(0L)).as(s"m_$tag"),
        side(cond, col("n_c")).cast("long").as(s"n_$tag"),
        side(cond, col("n_c") * col("n_c")).as(s"nn_$tag"),
        side(cond, col("sy")).as(s"sy_$tag"),
        side(cond, col("syy")).as(s"syy_$tag"),
        side(cond, col("sy") * col("sy")).as(s"cyy_$tag"),
        side(cond, col("sy") * col("n_c")).as(s"cyn_$tag")) ++
        (0 until p).flatMap(k => Seq(
          side(cond, col(s"sx$k")).as(s"sx${k}_$tag"),
          side(cond, col(s"sxy$k")).as(s"sxy${k}_$tag"),
          side(cond, col("sy") * col(s"sx$k")).as(s"cyx${k}_$tag"),
          side(cond, col(s"sx$k") * col("n_c")).as(s"cxn${k}_$tag"))) ++
        pairs.toSeq.map { case (k, l) =>
          side(cond, col(s"sxx${k}_$l")).as(s"sxx${k}_${l}_$tag")
        } ++
        pairs.toSeq.map { case (k, l) =>
          side(cond, col(s"sx$k") * col(s"sx$l")).as(s"cxx${k}_${l}_$tag")
        }
    val aggs = Seq(
      max(col("arms_c")).as("max_arms_c"),
      count_distinct(col("arm_c")).as("arms")) ++ armAggs(isA, "a") ++ armAggs(!isA, "b")
    val row = grid.agg(aggs.head, aggs.tail: _*).head()
    if (row.getAs[Long]("max_arms_c") > 1L) {
      val bad = grid.filter(col("arms_c") > 1).select("cl").limit(3)
        .collect().map(_.getString(0))
      throw new IllegalArgumentException(
        s"cluster(s) ${bad.mkString(", ")} appear in BOTH arms — cluster-robust " +
          "inference assumes assignment BY cluster; fix the randomization unit " +
          "or analyze at the subject level knowingly")
    }
    require(row.getAs[Long]("arms") == 2L,
      s"cupedMulti is a two-arm analysis; found ${row.getAs[Long]("arms")} arm(s)")
    def g(nm: String): Double = row.getAs[Double](nm)
    val (nA, nB) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    val (mA, mB) = (row.getAs[Long]("m_a"), row.getAs[Long]("m_b"))
    require(nA >= 2 && nB >= 2, s"need >=2 subjects per arm, got A=$nA B=$nB")
    require(mA >= 2 && mB >= 2,
      s"cluster-robust variance needs >=2 clusters per arm, got A=$mA B=$mB")
    val n = (nA + nB).toDouble
    val sy = g("sy_a") + g("sy_b")
    val sx = Array.tabulate(p)(k => g(s"sx${k}_a") + g(s"sx${k}_b"))
    val sxxP = pairs.map { case (k, l) => g(s"sxx${k}_${l}_a") + g(s"sxx${k}_${l}_b") }
    val sxyP = Array.tabulate(p)(k => g(s"sxy${k}_a") + g(s"sxy${k}_b"))
    val a = Array.tabulate(p, p)((k, l) => sxxP(pIdx(k)(l)) - sx(k) * sx(l) / n)
    val b = Array.tabulate(p)(k => sxyP(k) - sx(k) * sy / n)
    val theta = solvePsd(a, b, xCols, n)
    val mxPooled = Array.tabulate(p)(k => sx(k) / n)
    def armStats(t: String, nn: Long): (Double, Array[Double], Double, Double) = {
      val m = nn.toDouble
      val meanY = g(s"sy_$t") / m
      val meanX = Array.tabulate(p)(k => g(s"sx${k}_$t") / m)
      val varY = (g(s"syy_$t") - g(s"sy_$t") * g(s"sy_$t") / m) / (m - 1)
      val covXY = Array.tabulate(p)(k =>
        (g(s"sxy${k}_$t") - g(s"sx${k}_$t") * g(s"sy_$t") / m) / (m - 1))
      val varX = Array.tabulate(p, p)((k, l) =>
        (g(s"sxx${k}_${l}_$t") - g(s"sx${k}_$t") * g(s"sx${l}_$t") / m) / (m - 1))
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
    val (myA, mxA, varYA, varAdjA) = armStats("a", nA)
    val (myB, mxB, varYB, varAdjB) = armStats("b", nB)
    val deltaRaw = myA - myB
    val adjTerm = (mx: Array[Double]) =>
      (0 until p).map(k => theta(k) * (mx(k) - mxPooled(k))).sum
    val deltaCuped = (myA - adjTerm(mxA)) - (myB - adjTerm(mxB))
    val seRaw = math.sqrt(varYA / nA + varYB / nB)
    val seCuped = math.sqrt(varAdjA / nA + varAdjB / nB)
    val varReduction =
      if (seRaw > 0.0) 1.0 - (seCuped * seCuped) / (seRaw * seRaw) else 0.0
    // robust fold with T_c = sy_c − θᵀ·sx_c; th = null vector gives raw
    def robustVar(t: String, nn: Long, mm: Long, th: Array[Double]): Double = {
      var tt2 = g(s"cyy_$t")
      var ttn = g(s"cyn_$t")
      var tsum = g(s"sy_$t")
      var k = 0
      while (k < p) {
        tt2 -= 2 * th(k) * g(s"cyx${k}_$t")
        ttn -= th(k) * g(s"cxn${k}_$t")
        tsum -= th(k) * g(s"sx${k}_$t")
        var l = 0
        while (l < p) { tt2 += th(k) * th(l) * g(s"cxx${k}_${l}_$t"); l += 1 }
        k += 1
      }
      val tbar = tsum / nn
      mm.toDouble / (mm - 1) *
        (tt2 - 2 * tbar * ttn + tbar * tbar * g(s"nn_$t")) / (nn.toDouble * nn)
    }
    val zero = Array.fill(p)(0.0)
    val robustSeRaw = math.sqrt(robustVar("a", nA, mA, zero) + robustVar("b", nB, mB, zero))
    val robustSeCuped =
      math.sqrt(robustVar("a", nA, mA, theta) + robustVar("b", nB, mB, theta))
    Seq((nA, nB, mA, mB, theta.toSeq, deltaRaw, seRaw, robustSeRaw, deltaCuped,
      seCuped, robustSeCuped, varReduction))
      .toDF("n_a", "n_b", "m_a", "m_b", "theta", "delta_raw", "se_raw",
        "robust_se_raw", "delta_cuped", "se_cuped", "robust_se_cuped",
        "var_reduction")
  }

  /** Shared tiny Gaussian elimination with the singular-covariance
    * refusal both multi paths use. */
  private def solvePsd(
      a0: Array[Array[Double]], b0: Array[Double], xCols: Seq[String],
      n: Double): Array[Double] = {
    val p = b0.length
    val m = a0.map(_.clone()); val v = b0.clone()
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
}
