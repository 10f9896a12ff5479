package graft

import graft.ops.BayesAb

/** Contract of [[BayesAb.betaBinomial]]: the exact Beta-Binomial sum on
  * hand-integrable cases, the loss/lift identity, exact↔normal agreement
  * at realistic n, and the declared refusals. */
class BayesAbSpec extends SparkSuite {
  import spark.implicits._

  test("exact P(focal beats control) matches hand integration") {
    // focal: 1 subject, converted → posterior Beta(2,1) (density 2x);
    // control: 1 subject, not converted → Beta(1,2) (density 2(1−y)).
    // P(x>y) = ∫ 2x·(2x − x²) dx = 4/3 − 1/2 = 5/6
    val df = Seq(("t", 1), ("c", 0)).toDF("arm", "conv")
    val r = BayesAb.betaBinomial(df, "arm", "conv", focal = "t").head
    assert(math.abs(r.getAs[Double]("prob_focal_beats") - 5.0 / 6.0) < 1e-12,
      s"got ${r.getAs[Double]("prob_focal_beats")}")
    // and the uniform-vs-shifted case: Beta(2,1) vs Beta(1,1) → 2/3
    val df2 = Seq(("t", 1), ("c", 1), ("c", 0)).toDF("arm", "conv")
    // control: 2 subjects, 1 converted → Beta(2,2); compute instead the
    // symmetric sanity below; here just assert monotonicity vs df
    val r2 = BayesAb.betaBinomial(df2, "arm", "conv", focal = "t").head
    assert(r2.getAs[Double]("prob_focal_beats") <
      r.getAs[Double]("prob_focal_beats"),
      "a stronger control must lower P(focal beats)")
  }

  test("symmetric arms: prob exactly 1/2, zero lift, equal losses") {
    val df = (1 to 40).flatMap(i => Seq(("a", if (i <= 7) 1 else 0),
      ("b", if (i <= 7) 1 else 0))).toDF("arm", "conv")
    val r = BayesAb.betaBinomial(df, "arm", "conv", focal = "a").head
    assert(math.abs(r.getAs[Double]("prob_focal_beats") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("lift")) < 1e-15)
    assert(math.abs(r.getAs[Double]("exp_loss_focal") -
      r.getAs[Double]("exp_loss_ctrl")) < 1e-12)
  }

  test("loss identity: loss_ctrl − loss_focal ≡ lift (exact AND normal)") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 300).map { i =>
      val arm = if (i % 2 == 0) "t" else "c"
      (arm, if (rnd.nextDouble() < (if (arm == "t") 0.3 else 0.22)) 1 else 0)
    }.toDF("arm", "conv")
    Seq("exact", "normal").foreach { m =>
      val r = BayesAb.betaBinomial(df, "arm", "conv", focal = "t", method = m).head
      val gap = r.getAs[Double]("exp_loss_ctrl") - r.getAs[Double]("exp_loss_focal") -
        r.getAs[Double]("lift")
      assert(math.abs(gap) < 1e-10, s"$m identity gap $gap")
      assert(r.getAs[Double]("exp_loss_focal") >= 0 &&
        r.getAs[Double]("exp_loss_ctrl") >= 0, s"$m losses must be nonnegative")
    }
  }

  test("normal approximation agrees with the exact sum at realistic n") {
    val rnd = new scala.util.Random(9)
    val df = (1 to 2000).map { i =>
      val arm = if (i % 2 == 0) "t" else "c"
      (arm, if (rnd.nextDouble() < (if (arm == "t") 0.26 else 0.24)) 1 else 0)
    }.toDF("arm", "conv")
    val ex = BayesAb.betaBinomial(df, "arm", "conv", focal = "t").head
    val no = BayesAb.betaBinomial(df, "arm", "conv", focal = "t",
      method = "normal").head
    assert(math.abs(ex.getAs[Double]("prob_focal_beats") -
      no.getAs[Double]("prob_focal_beats")) < 0.01)
    assert(math.abs(ex.getAs[Double]("exp_loss_focal") -
      no.getAs[Double]("exp_loss_focal")) < 1e-3)
  }

  test("refusals: not-two-arms, absent focal, exact cap names the normal path") {
    val three = Seq(("a", 1), ("b", 0), ("c", 1)).toDF("arm", "conv")
    val e1 = intercept[IllegalArgumentException](
      BayesAb.betaBinomial(three, "arm", "conv", focal = "a"))
    assert(e1.getMessage.contains("two-arm"))
    val two = Seq(("a", 1), ("b", 0)).toDF("arm", "conv")
    val e2 = intercept[IllegalArgumentException](
      BayesAb.betaBinomial(two, "arm", "conv", focal = "z"))
    assert(e2.getMessage.contains("focal"))
    val e3 = intercept[IllegalArgumentException](
      BayesAb.betaBinomial(two, "arm", "conv", focal = "a", maxExact = 3))
    assert(e3.getMessage.contains("normal"), e3.getMessage)
    // and the normal method itself has no cap
    assert(BayesAb.betaBinomial(two, "arm", "conv", focal = "a",
      method = "normal", maxExact = 3).count() == 1)
    // a count-valued metric smuggled in as conv refuses by arm name
    val counts = Seq(("a", 3), ("b", 0)).toDF("arm", "conv")
    val e4 = intercept[IllegalArgumentException](
      BayesAb.betaBinomial(counts, "arm", "conv", focal = "a"))
    assert(e4.getMessage.contains("0/1") && e4.getMessage.contains("'a'"), e4.getMessage)
  }
}
