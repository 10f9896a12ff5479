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

  test("CUPED contrasts: two-arm case == Cuped.cuped bit-for-bit; constant covariate degrades") {
    // covariate predictive of y: x = i % 7, conversion more likely at
    // high x — deterministic
    val rows = for {
      (a, n, base) <- Seq(("c", 300, 1), ("t", 300, 2))
      i <- 0 until n
    } yield (a, if ((i * base) % 7 >= 5) 1.0 else 0.0, (i % 7).toDouble)
    val df = rows.toDF("arm", "y", "x")
    val got = graft.ops.MultiArm.report(df, "arm", "y", control = "c",
      xCol = Some("x")).head()
    val ref = graft.ops.Cuped.cuped(df, "arm", "y", "x", focal = "t").head()
    assert(math.abs(got.getAs[Double]("theta") - ref.getAs[Double]("theta")) < 1e-12)
    assert(math.abs(got.getAs[Double]("delta_cuped") - ref.getAs[Double]("delta_cuped")) < 1e-12)
    assert(math.abs(got.getAs[Double]("se_cuped") - ref.getAs[Double]("se_cuped")) < 1e-12)
    assert(math.abs(got.getAs[Double]("delta") - ref.getAs[Double]("delta_raw")) < 1e-12)
    // constant covariate: theta = 0, adjusted == raw
    val flat = graft.ops.MultiArm.report(
      df.withColumn("x", lit(1.0)), "arm", "y", control = "c",
      xCol = Some("x")).head()
    assert(flat.getAs[Double]("theta") == 0.0)
    assert(flat.getAs[Double]("delta_cuped") == flat.getAs[Double]("delta"))
    assert(flat.getAs[Double]("se_cuped") == flat.getAs[Double]("se"))
    // with a covariate declared, BH ranks the ADJUSTED p
    val multi = arms(("c", 400, 0.20), ("t1", 400, 0.20), ("t2", 400, 0.50))
      .withColumn("x", (rand(7) * 0).cast("double") + (col("y") * 0.0)) // constant
    val m = graft.ops.MultiArm.report(multi, "arm", "y", control = "c",
      xCol = Some("x")).orderBy("k").collect()
    m.zip(m.drop(1)).foreach { case (a, b) =>
      assert(a.getAs[Double]("p_cuped") <= b.getAs[Double]("p_cuped") + 1e-15,
        "k must rank by the adjusted p")
    }
  }

  test("two arms degrade to the plain Welch two-sample readout (q_bh == p)") {
    val got = MultiArm.report(
      arms(("c", 300, 0.2), ("t", 300, 0.35)), "arm", "y", control = "c").head()
    assert(got.getAs[Double]("q_bh") == math.min(1.0, got.getAs[Double]("p")))
    assert(got.getAs[Long]("k") == 1L)
  }
}
