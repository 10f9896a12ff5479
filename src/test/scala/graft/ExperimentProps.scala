package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.{BayesAb, Contingency, Hte, PowerAnalysis}

/** Properties of the round-15 experimentation family — the invariants
  * that must hold for ANY data, not just the unit fixtures: posterior
  * complementarity and the loss identity (BayesAb), the exact two-arm
  * chi-square closed form and count-scaling law (srm), pooled-effect
  * convexity (Hte), and design-arithmetic monotonicity (PowerAnalysis). */
object ExperimentProps extends Properties("Experiment") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSession.spark

  private def armDf(nA: Int, sA: Int, nB: Int, sB: Int) = {
    import spark.implicits._
    ((1 to nA).map(i => ("a", if (i <= sA) 1 else 0)) ++
      (1 to nB).map(i => ("b", if (i <= sB) 1 else 0))).toDF("arm", "conv")
  }

  private val genArms = for {
    nA <- Gen.choose(5, 60); sA <- Gen.choose(0, nA)
    nB <- Gen.choose(5, 60); sB <- Gen.choose(0, nB)
  } yield (nA, sA, nB, sB)

  property("BayesAb: P(a beats b) + P(b beats a) = 1; loss identity holds") =
    forAll(genArms) { case (nA, sA, nB, sB) =>
      val df = armDf(nA, sA, nB, sB)
      val ra = BayesAb.betaBinomial(df, "arm", "conv", focal = "a").head
      val rb = BayesAb.betaBinomial(df, "arm", "conv", focal = "b").head
      val comp = ra.getAs[Double]("prob_focal_beats") +
        rb.getAs[Double]("prob_focal_beats")
      val identA = ra.getAs[Double]("exp_loss_ctrl") -
        ra.getAs[Double]("exp_loss_focal") - ra.getAs[Double]("lift")
      math.abs(comp - 1.0) < 1e-9 && math.abs(identA) < 1e-9 &&
        ra.getAs[Double]("exp_loss_focal") >= -1e-12 &&
        ra.getAs[Double]("exp_loss_ctrl") >= -1e-12
    }

  property("srm: two-arm 50/50 chi2 is exactly (nA−nB)²/n; doubling counts doubles chi2") =
    forAll(for { nA <- Gen.choose(3, 80); nB <- Gen.choose(3, 80) } yield (nA, nB)) {
      case (nA, nB) =>
        import spark.implicits._
        def df(times: Int) =
          ((1 to nA * times).map(_ => "a") ++ (1 to nB * times).map(_ => "b"))
            .map(Tuple1(_)).toDF("arm")
        val half = Seq("a" -> 0.5, "b" -> 0.5)
        val c1 = Contingency.srm(df(1), "arm", half).head.getAs[Double]("chi2")
        val c2 = Contingency.srm(df(2), "arm", half).head.getAs[Double]("chi2")
        val n = (nA + nB).toDouble
        val closed = (nA - nB).toDouble * (nA - nB).toDouble / n
        math.abs(c1 - closed) < 1e-9 && math.abs(c2 - 2.0 * c1) < 1e-9
    }

  property("Hte: the pooled delta is a convex combination of the per-segment deltas") =
    forAll(for {
      a <- genArms; b <- genArms
      // keep every rate off the degenerate 0%/100%-both-arms corner
      if !(a._2 == 0 && a._4 == 0) && !(a._2 == a._1 && a._4 == a._3) &&
        !(b._2 == 0 && b._4 == 0) && !(b._2 == b._1 && b._4 == b._3)
    } yield (a, b)) { case ((nA1, sA1, nB1, sB1), (nA2, sA2, nB2, sB2)) =>
      import spark.implicits._
      def seg(name: String, nA: Int, sA: Int, nB: Int, sB: Int) =
        (1 to nA).map(i => (name, "t", if (i <= sA) 1 else 0)) ++
          (1 to nB).map(i => (name, "c", if (i <= sB) 1 else 0))
      val df = (seg("s1", nA1, sA1, nB1, sB1) ++ seg("s2", nA2, sA2, nB2, sB2))
        .toDF("segment", "arm", "conv")
      val r = Hte.homogeneity(df, "segment", "arm", "conv", focal = "t").head
      val d1 = sA1.toDouble / nA1 - sB1.toDouble / nB1
      val d2 = sA2.toDouble / nA2 - sB2.toDouble / nB2
      val pooled = r.getAs[Double]("pooled_delta")
      pooled >= math.min(d1, d2) - 1e-9 && pooled <= math.max(d1, d2) + 1e-9 &&
        r.getAs[Double]("q_stat") >= -1e-12 &&
        r.getAs[Double]("i2") >= 0.0 && r.getAs[Double]("i2") < 1.0
    }

  property("PowerAnalysis: MDE grows with required power and shrinks with looser alpha") =
    forAll(for {
      n <- Gen.choose(50, 400)
      spread <- Gen.choose(2, 9)
    } yield (n, spread)) { case (n, spread) =>
      import spark.implicits._
      val df = (1 to n).map(i => Tuple1(1.0 + (i % spread))).toDF("v")
      def mde(alpha: Double, power: Double) =
        PowerAnalysis.mdeTwoSample(df, "v", alpha = alpha, power = power)
          .head.getAs[Double]("mde_abs")
      mde(0.05, 0.9) > mde(0.05, 0.8) &&
        mde(0.01, 0.8) > mde(0.05, 0.8) &&
        mde(0.1, 0.8) < mde(0.05, 0.8)
    }
}
