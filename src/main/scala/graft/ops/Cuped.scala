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
}
