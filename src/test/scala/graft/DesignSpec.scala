package graft

import graft.ops.{Hte, PowerAnalysis}

/** Contracts of the experiment-design pair: [[PowerAnalysis.mdeTwoSample]]
  * (probit accuracy, √n scaling, required-n round trip, split optimality)
  * and [[Hte.homogeneity]] (hand-computed Q, homogeneous vs heterogeneous
  * fixtures, the refusal set). */
class DesignSpec extends SparkSuite {
  import spark.implicits._

  test("mde: probit hits the textbook z-values; MDE scales as 1/√n; n_needed round-trips") {
    val df = (1 to 7000).map(i => Tuple1((i % 7).toDouble)).toDF("v")
    val r = PowerAnalysis.mdeTwoSample(df, "v").head
    // A&S 26.2.23 is within 4.5e-4 of Φ⁻¹
    assert(math.abs(r.getAs[Double]("z_alpha") - 1.959964) < 5e-4)
    assert(math.abs(r.getAs[Double]("z_power") - 0.841621) < 5e-4)
    // quadrupling n halves the MDE (n a multiple of 7 keeps the value
    // distribution — hence mean and near-exactly the variance — fixed)
    val df4 = (1 to 28000).map(i => Tuple1((i % 7).toDouble)).toDF("v")
    val r4 = PowerAnalysis.mdeTwoSample(df4, "v").head
    // (to the Bessel n−1 correction: var_samp of the replicated frame
    // differs from the original's by 4(n−1)/(4n−1))
    assert(math.abs(r4.getAs[Double]("mde_abs") - r.getAs[Double]("mde_abs") / 2.0) < 1e-5)
    // a test sized at n_needed detects the target lift: recompute the
    // MDE as if n == n_needed and compare to target·mean
    val target = 0.02 * r.getAs[Double]("mean")
    val zSum = r.getAs[Double]("z_alpha") + r.getAs[Double]("z_power")
    val designVar = r.getAs[Double]("variance") * 4.0 // split 0.5 → 1/q+1/(1−q) = 4
    val mdeAtNeeded = zSum * math.sqrt(designVar / r.getAs[Long]("n_needed"))
    assert(mdeAtNeeded <= target + 1e-9, s"$mdeAtNeeded vs $target")
    assert(zSum * math.sqrt(designVar / (r.getAs[Long]("n_needed") - 1)) > target,
      "n_needed must be the SMALLEST sufficient n (ceil, not round)")
    // the balanced split minimizes the MDE
    val skew = PowerAnalysis.mdeTwoSample(df, "v", split = 0.2).head
    assert(skew.getAs[Double]("mde_abs") > r.getAs[Double]("mde_abs"))
    // refusals
    assert(intercept[IllegalArgumentException](
      PowerAnalysis.mdeTwoSample(df, "v", power = 0.3)).getMessage.contains("power"))
    assert(intercept[IllegalArgumentException](
      PowerAnalysis.mdeTwoSample(df, "v", split = 1.0)).getMessage.contains("split"))
  }

  test("homogeneity: hand-computed Q on two segments; uniform effect stays quiet") {
    // segment A: 100/100, focal 30 conv vs ctrl 20; segment B: focal 25 vs 24
    def seg(name: String, sf: Int, sc: Int): Seq[(String, String, Int)] =
      (1 to 100).map(i => (name, "t", if (i <= sf) 1 else 0)) ++
        (1 to 100).map(i => (name, "c", if (i <= sc) 1 else 0))
    val df = (seg("A", 30, 20) ++ seg("B", 25, 24)).toDF("segment", "arm", "conv")
    val r = Hte.homogeneity(df, "segment", "arm", "conv", focal = "t").head
    // replicate by hand
    def stats(sf: Int, sc: Int): (Double, Double) = {
      val (pf, pc) = (sf / 100.0, sc / 100.0)
      (pf - pc, pf * (1 - pf) / 100.0 + pc * (1 - pc) / 100.0)
    }
    val (d1, v1) = stats(30, 20); val (d2, v2) = stats(25, 24)
    val (w1, w2) = (1 / v1, 1 / v2)
    val pooled = (w1 * d1 + w2 * d2) / (w1 + w2)
    val qHand = w1 * (d1 - pooled) * (d1 - pooled) + w2 * (d2 - pooled) * (d2 - pooled)
    assert(math.abs(r.getAs[Double]("pooled_delta") - pooled) < 1e-12)
    assert(math.abs(r.getAs[Double]("q_stat") - qHand) < 1e-9)
    assert(r.getAs[Long]("dof") == 1)
    // identical effects in every segment: Q ≈ 0, no flag, i2 clamps to 0
    val same = (seg("A", 30, 20) ++ seg("B", 30, 20)).toDF("segment", "arm", "conv")
    val s = Hte.homogeneity(same, "segment", "arm", "conv", focal = "t").head
    assert(s.getAs[Double]("q_stat") < 1e-9)
    assert(!s.getAs[Boolean]("heterogeneous"))
    assert(s.getAs[Double]("i2") == 0.0)
  }

  test("homogeneity: a genuinely reversed segment fires; refusals name the offender") {
    // effect +0.3 in A, −0.3 in B at n=200/arm — unambiguous heterogeneity
    def seg(name: String, sf: Int, sc: Int): Seq[(String, String, Int)] =
      (1 to 200).map(i => (name, "t", if (i <= sf) 1 else 0)) ++
        (1 to 200).map(i => (name, "c", if (i <= sc) 1 else 0))
    val df = (seg("A", 100, 40) ++ seg("B", 40, 100)).toDF("segment", "arm", "conv")
    val r = Hte.homogeneity(df, "segment", "arm", "conv", focal = "t").head
    assert(r.getAs[Boolean]("heterogeneous"))
    assert(r.getAs[Double]("p_homogeneity") < 1e-6)
    assert(r.getAs[Double]("i2") > 0.9, "reversal should dominate sampling noise")
    // pooled delta cancels — exactly why the gate must exist
    assert(math.abs(r.getAs[Double]("pooled_delta")) < 0.01)
    // refusals: one-armed segment, degenerate segment, three arms, bad focal
    val oneArm = (seg("A", 100, 40) ++ (1 to 50).map(i => ("C", "t", i % 2)))
      .toDF("segment", "arm", "conv")
    assert(intercept[IllegalArgumentException](
      Hte.homogeneity(oneArm, "segment", "arm", "conv", "t").collect())
      .getMessage.contains("C"))
    val degen = (seg("A", 100, 40) ++
      (1 to 50).flatMap(_ => Seq(("D", "t", 1), ("D", "c", 1))))
      .toDF("segment", "arm", "conv")
    assert(intercept[IllegalArgumentException](
      Hte.homogeneity(degen, "segment", "arm", "conv", "t").collect())
      .getMessage.contains("D"))
    val three = Seq(("A", "t", 1), ("A", "c", 0), ("A", "x", 1))
      .toDF("segment", "arm", "conv")
    assert(intercept[IllegalArgumentException](
      Hte.homogeneity(three, "segment", "arm", "conv", "t"))
      .getMessage.contains("two-arm"))
    assert(intercept[IllegalArgumentException](
      Hte.homogeneity(df, "segment", "arm", "conv", "zzz"))
      .getMessage.contains("focal"))
    val countMetric = (seg("A", 100, 40) ++ Seq(("E", "t", 5), ("E", "c", 0)))
      .toDF("segment", "arm", "conv")
    assert(intercept[IllegalArgumentException](
      Hte.homogeneity(countMetric, "segment", "arm", "conv", "t").collect())
      .getMessage.contains("0/1"))
  }

  test("mde: a non-positive mean nulls the relative columns instead of ANSI-crashing") {
    val zeros = (1 to 100).map(_ => Tuple1(0.0)).toDF("v")
    val r = PowerAnalysis.mdeTwoSample(zeros, "v").head
    assert(r.getAs[Double]("mde_abs") == 0.0) // zero variance, zero MDE
    assert(r.isNullAt(r.fieldIndex("mde_rel")))
    assert(r.isNullAt(r.fieldIndex("n_needed")))
  }

  test("homogeneity: a single segment refuses (zero heterogeneity dof)") {
    import spark.implicits._
    val one = Seq(("s1", "t", 1), ("s1", "c", 0), ("s1", "t", 0), ("s1", "c", 1))
      .toDF("segment", "arm", "conv")
    val e = intercept[IllegalArgumentException](
      graft.ops.Hte.homogeneity(one, "segment", "arm", "conv", "t"))
    assert(e.getMessage.contains("two segments"), e.getMessage)
  }

  test("mdeTwoSampleClustered: singleton clusters give deff exactly 1; iid numbers match") {
    import spark.implicits._
    val df = (1 to 90).map(i => (s"u$i", ((i * 13) % 7).toDouble + 1.0))
      .toDF("cl", "v")
    val iid = PowerAnalysis.mdeTwoSample(df, "v").head
    val cl = PowerAnalysis.mdeTwoSampleClustered(df, "v", "cl").head
    assert(math.abs(cl.getAs[Double]("deff") - 1.0) < 1e-12)
    assert(math.abs(cl.getAs[Double]("mde_abs") - iid.getAs[Double]("mde_abs")) < 1e-12)
    assert(cl.getAs[Long]("n_needed") == iid.getAs[Long]("n_needed"))
    assert(cl.getAs[Long]("m") == 90L && cl.getAs[Long]("n") == 90L)
  }

  test("mdeTwoSampleClustered: cluster co-movement inflates the MDE; one cluster refuses") {
    import spark.implicits._
    // strong cluster effect: within-cluster values identical
    val clustered = (1 to 30).flatMap { c =>
      (1 to 4).map(_ => (s"g$c", ((c * 11) % 9).toDouble))
    }.toDF("cl", "v")
    val iid = PowerAnalysis.mdeTwoSample(clustered, "v").head
    val cl = PowerAnalysis.mdeTwoSampleClustered(clustered, "v", "cl").head
    assert(cl.getAs[Double]("deff") > 3.0,
      s"4 identical subjects per cluster must push deff toward 4, got ${cl.getAs[Double]("deff")}")
    assert(cl.getAs[Double]("mde_abs") > iid.getAs[Double]("mde_abs"))
    assert(cl.getAs[Long]("n_needed") > iid.getAs[Long]("n_needed"))
    assert(cl.getAs[Long]("m_needed") > 0L)
    val one = (1 to 5).map(i => ("only", i.toDouble)).toDF("cl", "v")
    val e = intercept[Exception](
      PowerAnalysis.mdeTwoSampleClustered(one, "v", "cl").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("at least 2 clusters"), msgs)
  }
}
