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

  test("cupedMulti: p=1 reproduces cuped exactly; a second informative covariate only helps") {
    val rnd = new scala.util.Random(53)
    val subjects = (1 to 600).map { i =>
      val arm = if (i % 2 == 0) "1" else "0"
      val x1 = rnd.nextInt(20).toDouble
      val x2 = rnd.nextInt(10).toDouble
      // y depends on BOTH pre-period metrics plus a true effect of 1
      val y = 0.5 * x1 + 0.8 * x2 + (if (arm == "1") 1.0 else 0.0) +
        rnd.nextGaussian()
      (arm, x1, x2, y)
    }.toDF("arm", "x1", "x2", "y")
    val single = Cuped.cuped(subjects, "arm", "y", "x1", focal = "1").head
    val multi1 = Cuped.cupedMulti(subjects, "arm", "y", Seq("x1"), focal = "1").head
    Seq("delta_raw", "se_raw", "delta_cuped", "se_cuped", "var_reduction")
      .foreach { c =>
        assert(math.abs(single.getAs[Double](c) - multi1.getAs[Double](c)) < 1e-12,
          s"$c: ${single.getAs[Double](c)} vs ${multi1.getAs[Double](c)}")
      }
    assert(math.abs(single.getAs[Double]("theta") -
      multi1.getAs[Seq[Double]]("theta").head) < 1e-12)
    val multi2 = Cuped.cupedMulti(subjects, "arm", "y", Seq("x1", "x2"),
      focal = "1").head
    assert(multi2.getAs[Double]("se_cuped") < multi1.getAs[Double]("se_cuped"),
      "a second informative covariate must shrink the SE further")
    assert(multi2.getAs[Double]("var_reduction") >
      multi1.getAs[Double]("var_reduction"))
    // both estimators still recover the planted effect of 1
    assert(math.abs(multi2.getAs[Double]("delta_cuped") - 1.0) <
      4 * multi2.getAs[Double]("se_cuped"))
    // a collinear covariate refuses by name
    val dup = subjects.withColumn("x3",
      org.apache.spark.sql.functions.col("x1") * 2.0)
    val e = intercept[IllegalArgumentException](
      Cuped.cupedMulti(dup, "arm", "y", Seq("x1", "x3"), focal = "1"))
    assert(e.getMessage.contains("collinear") || e.getMessage.contains("singular"),
      e.getMessage)
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

  test("clustered: singleton clusters reproduce the iid SEs exactly; points unchanged") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 120).map { i =>
      val arm = if (i % 2 == 0) "1" else "0"
      val x = (i % 7).toDouble
      val y = x * 2 + (if (arm == "1") 1.0 else 0.0) + rnd.nextInt(5)
      (s"u$i", arm, x, y)
    }.toDF("cl", "arm", "x", "y")
    val iid = Cuped.cuped(df, "arm", "y", "x", focal = "1").head
    val cl = Cuped.cuped(df, "arm", "y", "x", focal = "1", clusterCol = Some("cl")).head
    // one-row-per-cluster: m/(m-1) * sum((y-ybar)^2)/n^2 IS var_samp/n
    assert(math.abs(cl.getAs[Double]("robust_se_raw") - iid.getAs[Double]("se_raw")) < 1e-12)
    assert(math.abs(cl.getAs[Double]("robust_se_cuped") - iid.getAs[Double]("se_cuped")) < 1e-12)
    assert(math.abs(cl.getAs[Double]("theta") - iid.getAs[Double]("theta")) < 1e-15)
    assert(math.abs(cl.getAs[Double]("delta_cuped") - iid.getAs[Double]("delta_cuped")) < 1e-15)
    assert(math.abs(cl.getAs[Double]("se_raw") - iid.getAs[Double]("se_raw")) < 1e-15)
    // multi path, p = 1, same invariance
    val clM = Cuped.cupedMulti(df, "arm", "y", Seq("x"), focal = "1",
      clusterCol = Some("cl")).head
    assert(math.abs(clM.getAs[Double]("robust_se_raw") - iid.getAs[Double]("se_raw")) < 1e-12)
    assert(math.abs(clM.getAs[Double]("robust_se_cuped") - iid.getAs[Double]("se_cuped")) < 1e-12)
  }

  test("clustered: 4x within-cluster duplication wrongly halves the iid SE, robust SE invariant") {
    val rnd = new scala.util.Random(23)
    val base = (1 to 40).flatMap { c =>
      val arm = if (c % 2 == 0) "1" else "0"
      (1 to 3).map { j =>
        val x = ((c * 7 + j) % 5).toDouble
        (s"c$c", arm, x, x + rnd.nextInt(4) + (if (arm == "1") 0.5 else 0.0))
      }
    }
    val once = base.toDF("cl", "arm", "x", "y")
    val dup4 = (base ++ base ++ base ++ base).toDF("cl", "arm", "x", "y")
    val r1 = Cuped.cuped(once, "arm", "y", "x", "1", Some("cl")).head
    val r4 = Cuped.cuped(dup4, "arm", "y", "x", "1", Some("cl")).head
    // same clusters, same per-cluster means: cluster-level information
    // did not grow, and the robust SE says so
    assert(math.abs(r4.getAs[Double]("robust_se_raw") - r1.getAs[Double]("robust_se_raw")) < 1e-12)
    assert(math.abs(r4.getAs[Double]("robust_se_cuped") - r1.getAs[Double]("robust_se_cuped")) < 1e-12)
    // while the iid SE wrongly claims half the uncertainty (ratio -> 1/2
    // up to the n/(n-1) correction)
    val shrink = r4.getAs[Double]("se_raw") / r1.getAs[Double]("se_raw")
    assert(shrink < 0.52 && shrink > 0.48, s"iid shrink was $shrink")
    assert(r4.getAs[Long]("m_a") == r1.getAs[Long]("m_a"))
    assert(r4.getAs[Long]("n_a") == 4 * r1.getAs[Long]("n_a"))
  }

  test("clustered: a cluster seen in both arms refuses by name; <2 clusters per arm refuses") {
    val broken = Seq(
      ("g1", "1", 1.0, 2.0), ("g1", "0", 2.0, 3.0),
      ("g2", "1", 1.0, 2.0), ("g2", "1", 2.0, 4.0),
      ("g3", "0", 1.0, 2.0), ("g3", "0", 3.0, 4.0),
      ("g4", "1", 2.0, 2.0), ("g5", "0", 2.0, 5.0))
      .toDF("cl", "arm", "x", "y")
    val e = intercept[IllegalArgumentException](
      Cuped.cuped(broken, "arm", "y", "x", "1", Some("cl")))
    assert(e.getMessage.contains("BOTH arms") && e.getMessage.contains("g1"), e.getMessage)
    val oneCluster = Seq(
      ("g1", "1", 1.0, 2.0), ("g1", "1", 2.0, 3.0), ("g1", "1", 2.5, 3.0),
      ("g2", "0", 1.0, 2.0), ("g2", "0", 3.0, 4.0), ("g3", "0", 2.0, 2.0))
      .toDF("cl", "arm", "x", "y")
    val e2 = intercept[IllegalArgumentException](
      Cuped.cuped(oneCluster, "arm", "y", "x", "1", Some("cl")))
    assert(e2.getMessage.contains("clusters per arm"), e2.getMessage)
  }
}
