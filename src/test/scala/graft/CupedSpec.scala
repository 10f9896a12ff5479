package graft

import org.apache.spark.sql.functions._

import graft.ops.Cuped

/** [[Cuped.cuped]] — variance-reduced A/B estimation on constructed
  * cohorts with known structure. */
class CupedSpec extends SparkSuite {
  import spark.implicits._

  test("perfectly predictive pre-period: theta exact, variance fully removed") {
    // x independent of arm; y = 3x + 5*arm (no noise): the adjusted
    // metric is constant within each arm, so CUPED removes ALL variance
    // and both estimators land the true effect 5 exactly
    val subjects = (0 until 400).map { i =>
      val arm = (i / 20) % 2
      val x = (i % 20).toDouble
      (arm.toString, x, 3.0 * x + 5.0 * arm)
    }.toDF("arm", "x", "y")
    val r = Cuped.cuped(subjects, "arm", "y", "x", focal = "1").head()
    assert(r.getAs[Long]("n_a") == 200 && r.getAs[Long]("n_b") == 200)
    assert(math.abs(r.getAs[Double]("theta") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("delta_raw") - 5.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("delta_cuped") - 5.0) < 1e-12)
    // moment-form variance cancels catastrophically at exactly-zero
    // residuals — anything at e-8 scale IS the zero here (se_raw ~ 0.9)
    assert(r.getAs[Double]("se_cuped") < 1e-6,
      s"zero residual variance expected, got ${r.getAs[Double]("se_cuped")}")
    assert(r.getAs[Double]("var_reduction") > 0.999999)
  }

  test("pre-period imbalance: CUPED pulls the estimate toward truth, variance shrinks") {
    // arm correlated with x (odd i → arm 1 → higher x): the raw delta is
    // biased to 5 + 3·(x̄_A − x̄_B) = 8; the adjustment removes most of
    // the imbalance and ALWAYS shrinks the standard error
    val subjects = (1 to 400).map { i =>
      val arm = i % 2
      val x = (i % 20).toDouble
      (arm.toString, x, 3.0 * x + 5.0 * arm)
    }.toDF("arm", "x", "y")
    val r = Cuped.cuped(subjects, "arm", "y", "x", focal = "1").head()
    assert(math.abs(r.getAs[Double]("delta_raw") - 8.0) < 1e-12,
      s"raw delta must carry the imbalance: ${r.getAs[Double]("delta_raw")}")
    assert(math.abs(r.getAs[Double]("delta_cuped") - 5.0) <
      math.abs(r.getAs[Double]("delta_raw") - 5.0),
      "adjusted estimate must sit closer to the true effect")
    assert(r.getAs[Double]("se_cuped") < r.getAs[Double]("se_raw"))
    assert(r.getAs[Double]("var_reduction") > 0.5)
  }

  test("uninformative covariate: theta ~ 0 and CUPED degrades gracefully to raw") {
    // y depends on arm plus a deterministic pseudo-noise uncorrelated
    // with x — adjustment buys (almost) nothing but must not hurt
    val subjects = (1 to 500).map { i =>
      val arm = (i / 25) % 2
      val x = ((i * 7) % 13).toDouble
      val noise = ((i * 31) % 11).toDouble
      (arm.toString, x, 2.0 * arm + noise)
    }.toDF("arm", "x", "y")
    val r = Cuped.cuped(subjects, "arm", "y", "x", focal = "1").head()
    assert(math.abs(r.getAs[Double]("delta_cuped") - r.getAs[Double]("delta_raw")) < 0.2)
    assert(r.getAs[Double]("var_reduction") > -0.05 && r.getAs[Double]("var_reduction") < 0.2)
    // constant covariate: theta is exactly 0 and CUPED == raw exactly
    val const = subjects.withColumn("x", lit(1.0))
    val rc = Cuped.cuped(const, "arm", "y", "x", focal = "1").head()
    assert(rc.getAs[Double]("theta") == 0.0)
    assert(rc.getAs[Double]("delta_cuped") == rc.getAs[Double]("delta_raw"))
    assert(rc.getAs[Double]("var_reduction") == 0.0)
  }

  test("a third arm refuses; tiny arms refuse") {
    val three = Seq(("0", 1.0, 1.0), ("1", 2.0, 2.0), ("2", 3.0, 3.0),
      ("0", 2.0, 1.0), ("1", 1.0, 2.0), ("2", 2.0, 3.0))
      .toDF("arm", "x", "y")
    val e = intercept[IllegalArgumentException](
      Cuped.cuped(three, "arm", "y", "x", focal = "1"))
    assert(e.getMessage.contains("two-arm"), e.getMessage)
    val tiny = Seq(("0", 1.0, 1.0), ("1", 2.0, 2.0)).toDF("arm", "x", "y")
    val e2 = intercept[IllegalArgumentException](
      Cuped.cuped(tiny, "arm", "y", "x", focal = "1"))
    assert(e2.getMessage.contains("subjects per arm"), e2.getMessage)
  }
}
