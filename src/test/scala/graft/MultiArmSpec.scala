package graft

import org.apache.spark.sql.functions._

import graft.ops.MultiArm

/** [[MultiArm.report]] — the A/B/n readout: Welch vs-control contrasts
  * with the BH step-up replayed by hand, plus every refusal by name. */
class MultiArmSpec extends SparkSuite {
  import spark.implicits._

  // deterministic arms: first round(p*n) subjects of each arm convert
  private def arms(spec: (String, Int, Double)*) =
    spec.flatMap { case (a, n, p) =>
      (0 until n).map(i => (a, if (i < math.round(p * n)) 1.0 else 0.0))
    }.toDF("arm", "y")

  test("per-arm Welch contrast + BH step-up match a hand replay; strong arm discovered") {
    val df = arms(("c", 400, 0.20), ("t1", 400, 0.20), ("t2", 400, 0.50),
      ("t3", 400, 0.27))
    val got = MultiArm.report(df, "arm", "y", control = "c")
      .orderBy("arm").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("t1", "t2", "t3"))
    // hand replay of one contrast (t2): Welch from sample moments
    def moments(p: Double, n: Int) = {
      val conv = math.round(p * n).toDouble
      val mean = conv / n
      val v = (conv - conv * conv / n) / (n - 1)
      (mean, v)
    }
    val (mc, vc) = moments(0.20, 400)
    val (m2, v2) = moments(0.50, 400)
    val t2 = got(1)
    assert(math.abs(t2.getAs[Double]("delta") - (m2 - mc)) < 1e-12)
    assert(math.abs(t2.getAs[Double]("se") - math.sqrt(v2 / 400 + vc / 400)) < 1e-12)
    // BH by hand: sort p ascending, q_i = min_{j>=i} p_j*3/j capped at 1
    val byK = got.sortBy(_.getAs[Long]("k"))
    val ps = byK.map(_.getAs[Double]("p"))
    val expectedQ = ps.indices.map { i =>
      math.min(1.0, ps.indices.drop(i).map(j => ps(j) * 3.0 / (j + 1)).min)
    }
    byK.zip(expectedQ).foreach { case (r, q) =>
      assert(math.abs(r.getAs[Double]("q_bh") - q) < 1e-12,
        s"arm ${r.getString(0)}: q=${r.getAs[Double]("q_bh")} expected $q")
    }
    // q is monotone in rank and never below its own p
    byK.map(_.getAs[Double]("q_bh")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b + 1e-15); case _ => ()
    }
    byK.foreach(r => assert(r.getAs[Double]("q_bh") >= r.getAs[Double]("p") - 1e-15))
    // the 30-point lift is a discovery; the exact null is not
    assert(got(1).getAs[Boolean]("discovery"), "t2 must be discovered")
    assert(!got(0).getAs[Boolean]("discovery"), "t1 is an exact null")
  }

  test("refusals by name: missing control, single arm, thin arm, level explosion") {
    val ok = arms(("c", 40, 0.2), ("t1", 40, 0.3))
    val e1 = intercept[IllegalArgumentException](
      MultiArm.report(ok, "arm", "y", control = "zz"))
    assert(e1.getMessage.contains("control arm 'zz'"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MultiArm.report(arms(("c", 40, 0.2)), "arm", "y", control = "c"))
    assert(e2.getMessage.contains("at least control"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      MultiArm.report(ok.union(Seq(("thin", 1.0)).toDF("arm", "y")),
        "arm", "y", control = "c"))
    assert(e3.getMessage.contains("thin"), e3.getMessage)
    val many = (0 until 70).flatMap(a => Seq((s"a$a", 0.0), (s"a$a", 1.0)))
      .toDF("arm", "y")
    val e4 = intercept[IllegalArgumentException](
      MultiArm.report(many, "arm", "y", control = "a0"))
    assert(e4.getMessage.contains("segmentation"), e4.getMessage)
  }

  test("two arms degrade to the plain Welch two-sample readout (q_bh == p)") {
    val got = MultiArm.report(
      arms(("c", 300, 0.2), ("t", 300, 0.35)), "arm", "y", control = "c").head()
    assert(got.getAs[Double]("q_bh") == math.min(1.0, got.getAs[Double]("p")))
    assert(got.getAs[Long]("k") == 1L)
  }
}
