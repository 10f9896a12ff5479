package graft

import org.apache.spark.sql.functions._

import graft.ops.SequentialTest

/** [[SequentialTest.obfMonitor]] — constructed cohorts with known
  * conversion rates against the O'Brien-Fleming-shaped boundary. */
class SequentialTestSpec extends SparkSuite {
  import spark.implicits._

  // n subjects per arm per day over `days` days; arm "1" converts at
  // pA on the entry day, arm "0" at pB (deterministic: the first
  // round(p*n) subjects of each cohort convert)
  private def cohorts(days: Int, perDay: Int, pA: Double, pB: Double) = {
    val rows = for {
      d <- 0 until days
      arm <- Seq("1", "0")
      i <- 0 until perDay
    } yield {
      val p = if (arm == "1") pA else pB
      val converts = i < math.round(p * perDay)
      (arm, d, if (converts) Some(d) else None)
    }
    rows.toDF("arm", "entry_day", "conv_day")
  }

  private def looksOf(days: Int) = (0 until days).toDF("day")

  test("boundary is OBF-shaped: strictly decreasing, ending at the nominal z") {
    val out = SequentialTest.obfMonitor(
      cohorts(10, 50, 0.3, 0.3), "arm", "entry_day", "conv_day",
      looksOf(10), "day", focal = "1", minPerArm = 30L)
      .orderBy("day").collect()
    assert(out.length == 10)
    val bounds = out.map(_.getAs[Double]("boundary"))
    assert(bounds.sliding(2).forall(w => w(0) > w(1)), bounds.mkString(","))
    assert(math.abs(bounds.last - 1.96) < 1e-9,
      s"final look must use the nominal critical value, got ${bounds.last}")
    // K=10, k=1 → 1.96·√10
    assert(math.abs(bounds.head - 1.96 * math.sqrt(10.0)) < 1e-9)
  }

  test("a null effect never crosses; a strong effect crosses once evidence accrues") {
    val calm = SequentialTest.obfMonitor(
      cohorts(10, 50, 0.3, 0.3), "arm", "entry_day", "conv_day",
      looksOf(10), "day", focal = "1", minPerArm = 30L).collect()
    assert(calm.forall(!_.getAs[Boolean]("crossed")),
      "identical rates must never cross")
    assert(calm.forall(r => math.abs(r.getAs[Double]("z")) < 1e-9),
      "deterministic equal cohorts have z = 0 exactly")

    val eff = SequentialTest.obfMonitor(
      cohorts(12, 60, 0.5, 0.2), "arm", "entry_day", "conv_day",
      looksOf(12), "day", focal = "1", minPerArm = 30L)
      .orderBy("day").collect()
    val firstCross = eff.indexWhere(_.getAs[Boolean]("crossed"))
    assert(firstCross > 0,
      s"a 30-point lift must cross, but not at the very first look: " +
        eff.map(r => (r.getAs[Double]("z"), r.getAs[Double]("boundary"))).mkString(","))
    // once crossed under a constant effect, it stays crossed (evidence
    // only accrues, the boundary only relaxes)
    assert(eff.drop(firstCross).forall(_.getAs[Boolean]("crossed")))
  }

  test("always-valid p: nonincreasing; null effect stays high, strong effect sinks") {
    def pSeries(pA: Double, pB: Double) = {
      val m = SequentialTest.obfMonitor(
        cohorts(12, 60, pA, pB), "arm", "entry_day", "conv_day",
        looksOf(12), "day", focal = "1", minPerArm = 30L)
      SequentialTest.alwaysValidP(m)
        .orderBy("day").collect().map(_.getAs[Double]("p_always_valid"))
    }
    val calm = pSeries(0.3, 0.3)
    // p is a RUNNING min of a positive quantity — nonincreasing always
    assert(calm.sliding(2).forall(w => w(1) <= w(0) + 1e-15), calm.mkString(","))
    // equal rates: ln Λ < 0 (the √(V/(V+τ²)) deficit with Δ = 0), p stays 1
    assert(calm.forall(_ == 1.0), calm.mkString(","))
    val eff = pSeries(0.5, 0.2)
    assert(eff.sliding(2).forall(w => w(1) <= w(0) + 1e-15), eff.mkString(","))
    assert(eff.last < 0.05,
      s"a 30-point lift must reach significance under always-valid monitoring: " +
        eff.mkString(","))
  }

  test("looks below minPerArm are previews, not tests: k counts qualifying looks only") {
    // 10 subjects/arm/day: the 30-per-arm gate clears at day 2 (cumulative 30)
    val out = SequentialTest.obfMonitor(
      cohorts(8, 10, 0.4, 0.4), "arm", "entry_day", "conv_day",
      looksOf(8), "day", focal = "1", minPerArm = 30L)
      .orderBy("day").collect()
    assert(out.length == 6, out.mkString(","))
    assert(out.head.getAs[Int]("day") == 2)
    assert(out.head.getAs[Long]("k") == 1L)
    assert(out.last.getAs[Long]("k") == 6L)
  }

  test("a third arm refuses: the non-focal side would duplicate look days") {
    // with 3+ arms the B side (every non-focal arm) joins one row per arm
    // per day, making k/bigk ambiguous — the op must refuse, not emit a
    // corrupted monitor
    val three = cohorts(4, 10, 0.4, 0.4)
      .union(Seq(("2", 0, Some(0))).toDF("arm", "entry_day", "conv_day"))
    val e = intercept[IllegalArgumentException] {
      SequentialTest.obfMonitor(
        three, "arm", "entry_day", "conv_day", looksOf(4), "day", focal = "1")
    }
    assert(e.getMessage.contains("two-arm"), e.getMessage)
    // and a focal arm that is not present refuses by name
    val e2 = intercept[IllegalArgumentException] {
      SequentialTest.obfMonitor(
        cohorts(4, 10, 0.4, 0.4), "arm", "entry_day", "conv_day",
        looksOf(4), "day", focal = "treated")
    }
    assert(e2.getMessage.contains("focal"), e2.getMessage)
  }

  // deterministic continuous cohorts: per (arm, day, i) value = base +
  // (i mod 5) spread — same mean shift every day, nonzero variance
  private def meanCohorts(days: Int, perDay: Int, muA: Double, muB: Double) = {
    val rows = for {
      d <- 0 until days
      arm <- Seq("1", "0")
      i <- 0 until perDay
    } yield (arm, d, (if (arm == "1") muA else muB) + (i % 5).toDouble)
    rows.toDF("arm", "entry_day", "v")
  }

  test("mean monitor + always-valid: moments exact, p nonincreasing, null calm, shift sinks") {
    def series(muA: Double, muB: Double) = {
      val m = SequentialTest.meanMonitor(
        meanCohorts(12, 60, muA, muB), "arm", "entry_day", "v",
        looksOf(12), "day", focal = "1", minPerArm = 30L)
      SequentialTest.alwaysValidPMean(m, tau = 0.5).orderBy("day").collect()
    }
    val calm = series(10.0, 10.0)
    // cumulative moments are exact longs/sums: day k holds k·perDay
    // subjects and k·perDay·(μ + 2) value (the i%5 spread means +2)
    calm.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_a") == (i + 1) * 60L)
      assert(math.abs(r.getAs[Double]("sum_a") - (i + 1) * 60L * 12.0) < 1e-9)
    }
    val calmP = calm.map(_.getAs[Double]("p_always_valid"))
    assert(calmP.sliding(2).forall(w => w(1) <= w(0) + 1e-15))
    assert(calmP.forall(_ == 1.0), calmP.mkString(","))
    val eff = series(11.0, 10.0).map(_.getAs[Double]("p_always_valid"))
    assert(eff.sliding(2).forall(w => w(1) <= w(0) + 1e-15))
    assert(eff.last < 0.05,
      s"a 1.0 mean shift on sd ~1.4 must reach significance: ${eff.mkString(",")}")
    // τ is required and must be positive — there is no cross-metric default
    val e = intercept[IllegalArgumentException](
      SequentialTest.alwaysValidPMean(
        SequentialTest.meanMonitor(meanCohorts(4, 40, 10, 10), "arm",
          "entry_day", "v", looksOf(4), "day", focal = "1"), tau = 0.0))
    assert(e.getMessage.contains("tau"), e.getMessage)
    // a third arm refuses here too
    val three = meanCohorts(4, 10, 10, 10)
      .union(Seq(("2", 0, 1.0)).toDF("arm", "entry_day", "v"))
    val e2 = intercept[IllegalArgumentException] {
      SequentialTest.meanMonitor(
        three, "arm", "entry_day", "v", looksOf(4), "day", focal = "1")
    }
    assert(e2.getMessage.contains("two-arm"), e2.getMessage)
  }
}
