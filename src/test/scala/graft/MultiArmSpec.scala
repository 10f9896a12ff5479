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

  // ---- sequential (always-valid A/B/n) ----

  // deterministic multi-day subjects: integer-valued metric (sums exact
  // in FP regardless of aggregation order) with per-arm rate shifts
  private def seqSubjects(spec: (String, Int)*): org.apache.spark.sql.DataFrame =
    spec.flatMap { case (a, shift) =>
      for (day <- 1 to 10; i <- 0 until 12)
        yield (a, day, ((i + day * shift) % 7).toDouble, (i % 5).toDouble)
    }.toDF("arm", "day", "v", "x")

  private def looks10 = (1 to 10).toDF("day")

  test("sequential: two-arm case == meanMonitor + alwaysValidPMean bitwise") {
    val subj = seqSubjects(("c", 1), ("t", 3))
    val mon = graft.ops.SequentialTest.meanMonitor(
      subj, "arm", "day", "v", looks10, "day", focal = "t", minPerArm = 5L)
    val ref = graft.ops.SequentialTest.alwaysValidPMean(mon, tau = 0.5)
      .select(col("day"), col("k"),
        (col("mean_a") - col("mean_b")).as("delta"),
        col("log_lambda"), col("p_always_valid"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val got = MultiArm.sequential(
      subj, "arm", "day", "v", looks10, "day", control = "c", tau = 0.5,
      minPerArm = 5L).collect()
    assert(got.nonEmpty && got.length == ref.size)
    got.foreach { r =>
      val (k, d, ll, p) = ref(r.getAs[Int]("day"))
      assert(r.getAs[Long]("k") == k)
      assert(r.getAs[Double]("delta") == d, s"delta at day ${r.getAs[Int]("day")}")
      assert(r.getAs[Double]("log_lambda") == ll, "log_lambda must be bitwise")
      assert(r.getAs[Double]("p_always_valid") == p, "p must be bitwise")
      // two arms: the single contrast is always rank 1 of m=1, q == p
      assert(r.getAs[Long]("m") == 1L && r.getAs[Long]("rk") == 1L)
      assert(r.getAs[Double]("q_bh") == math.min(1.0, p))
    }
  }

  test("sequential CUPED: final look == report's fixed-horizon theta/delta/se; BH ranks adjusted p") {
    val subj = seqSubjects(("c", 1), ("t1", 2), ("t2", 4), ("t3", 6))
    val got = MultiArm.sequential(
      subj, "arm", "day", "v", looks10, "day", control = "c", tau = 0.5,
      minPerArm = 2L, xCol = Some("x")).collect()
    val lastDay = got.map(_.getAs[Int]("day")).max
    val fin = got.filter(_.getAs[Int]("day") == lastDay)
      .map(r => r.getAs[String]("arm") -> r).toMap
    val fixed = MultiArm.report(subj, "arm", "v", control = "c",
      xCol = Some("x")).collect()
    assert(fixed.length == 3 && fin.size == 3)
    fixed.foreach { f =>
      val s = fin(f.getAs[String]("arm"))
      assert(s.getAs[Long]("n") == f.getAs[Long]("n"))
      assert(math.abs(s.getAs[Double]("theta") - f.getAs[Double]("theta")) < 1e-12)
      assert(math.abs(s.getAs[Double]("delta") - f.getAs[Double]("delta")) < 1e-12)
      assert(math.abs(s.getAs[Double]("delta_cuped") - f.getAs[Double]("delta_cuped")) < 1e-12)
      assert(math.abs(s.getAs[Double]("se_cuped") - f.getAs[Double]("se_cuped")) < 1e-12)
    }
    // per-look BH hand replay over the ADJUSTED always-valid p
    got.groupBy(_.getAs[Int]("day")).foreach { case (_, rows) =>
      val byRk = rows.sortBy(_.getAs[Long]("rk"))
      val ps = byRk.map(_.getAs[Double]("p_always_valid_cuped"))
      assert(ps.sameElements(ps.sorted), "rk must rank by adjusted p")
      val m = rows.length
      byRk.zipWithIndex.foreach { case (r, i) =>
        val expQ = math.min(1.0,
          (i until m).map(j => ps(j) * m / (j + 1)).min)
        assert(math.abs(r.getAs[Double]("q_bh") - expQ) < 1e-12)
        assert(r.getAs[Boolean]("discovery") == (r.getAs[Double]("q_bh") <= 0.05))
      }
    }
    // p_always_valid_cuped is nonincreasing per arm (the running max)
    got.groupBy(_.getAs[String]("arm")).foreach { case (_, rows) =>
      rows.sortBy(_.getAs[Int]("day")).map(_.getAs[Double]("p_always_valid_cuped"))
        .toSeq.sliding(2).foreach {
          case Seq(a, b) => assert(b <= a + 1e-15); case _ => ()
        }
    }
  }

  test("sequential: constant covariate degrades adjusted columns to raw") {
    val subj = seqSubjects(("c", 1), ("t", 3)).withColumn("x", lit(2.0))
    val got = MultiArm.sequential(
      subj, "arm", "day", "v", looks10, "day", control = "c", tau = 0.5,
      minPerArm = 2L, xCol = Some("x")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Double]("theta") == 0.0)
      assert(r.getAs[Double]("delta_cuped") == r.getAs[Double]("delta"))
      assert(r.getAs[Double]("log_lambda_cuped") == r.getAs[Double]("log_lambda"))
      assert(r.getAs[Double]("p_always_valid_cuped") == r.getAs[Double]("p_always_valid"))
    }
  }

  test("cluster CUPED monitor with one-subject clusters == MultiArm.sequential; constant covariate degrades") {
    // one-subject clusters with a deterministic unit id
    val stable = seqSubjects(("c", 1), ("t", 3))
      .withColumn("unit",
        concat(col("arm"), lit("_"), col("day"), lit("_"),
          col("v"), lit("_"), col("x"), lit("_"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("arm", "day", "v", "x").orderBy("arm"))))
    val monitor = graft.ops.SequentialTest.clusterMeanMonitor(
      stable, "arm", "day", "v", "unit", looks10, "day",
      focal = "t", control = "c", minClusters = 5L, xCol = Some("x"))
    val cl = graft.ops.SequentialTest.alwaysValidPMeanCuped(monitor, tau = 0.5)
      .collect().map(r => r.getAs[Int]("day") -> r).toMap
    val ma = MultiArm.sequential(
      seqSubjects(("c", 1), ("t", 3)), "arm", "day", "v", looks10, "day",
      control = "c", tau = 0.5, minPerArm = 5L, xCol = Some("x")).collect()
    assert(ma.nonEmpty && cl.nonEmpty && ma.length == cl.size)
    // with every cluster one subject, the cluster-mean CUPED monitor IS
    // the subject-level sequential readout — same theta, adjusted lift,
    // ln-lambda and always-valid p
    ma.foreach { m =>
      val c = cl(m.getAs[Int]("day"))
      assert(math.abs(c.getAs[Double]("theta") - m.getAs[Double]("theta")) < 1e-12)
      assert(math.abs(c.getAs[Double]("delta_cuped") - m.getAs[Double]("delta_cuped")) < 1e-12)
      assert(math.abs(c.getAs[Double]("log_lambda_cuped") -
        m.getAs[Double]("log_lambda_cuped")) < 1e-12)
      assert(math.abs(c.getAs[Double]("p_always_valid_cuped") -
        m.getAs[Double]("p_always_valid_cuped")) < 1e-12)
    }
    // constant covariate: adjusted == raw, bitwise (theta = 0 exactly)
    val flatMon = graft.ops.SequentialTest.clusterMeanMonitor(
      stable.withColumn("x", lit(3.0)), "arm", "day", "v", "unit", looks10,
      "day", focal = "t", control = "c", minClusters = 5L, xCol = Some("x"))
    graft.ops.SequentialTest.alwaysValidPMeanCuped(flatMon, tau = 0.5)
      .collect().foreach { r =>
        assert(r.getAs[Double]("theta") == 0.0)
        assert(r.getAs[Double]("delta_cuped") ==
          r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b"))
        assert(r.getAs[Double]("p_always_valid_cuped") >= 0.0 &&
          r.getAs[Double]("p_always_valid_cuped") <= 1.0)
      }
  }

  // deterministic cluster-randomized fixture: geo decides the arm, so
  // no cluster is ever mixed unless a test injects an invasion
  private def clSubjects(k: Int): org.apache.spark.sql.DataFrame =
    (for {
      g <- 0 until 12
      day <- 1 to 10
      i <- 0 until 6
    } yield (s"a${g % k}", day, ((i + day * (1 + g % k) + g) % 7).toDouble,
      ((i + g) % 5).toDouble, s"g$g"))
      .toDF("arm", "day", "v", "x", "geo")

  test("sequentialClustered: two-arm case == clusterMeanMonitor + alwaysValidPMean(Cuped); mixed_m rides") {
    val subj = clSubjects(2)
    val mon = graft.ops.SequentialTest.clusterMeanMonitor(
      subj, "arm", "day", "v", "geo", looks10, "day",
      focal = "a1", control = "a0", minClusters = 2L, xCol = Some("x"))
    val raw = graft.ops.SequentialTest.alwaysValidPMean(mon, tau = 0.5)
      .collect().map(r => r.getAs[Int]("day") -> r).toMap
    val cup = graft.ops.SequentialTest.alwaysValidPMeanCuped(mon, tau = 0.5)
      .collect().map(r => r.getAs[Int]("day") -> r).toMap
    val got = MultiArm.sequentialClustered(
      subj, "arm", "day", "v", "geo", looks10, "day", control = "a0",
      tau = 0.5, minClusters = 2L, xCol = Some("x")).collect()
    assert(got.nonEmpty && got.length == raw.size)
    got.foreach { g =>
      val day = g.getAs[Int]("day")
      val r = raw(day); val c = cup(day)
      assert(g.getAs[Long]("n") == r.getAs[Long]("n_a"))
      assert(g.getAs[Long]("mixed_m") == r.getAs[Long]("mixed_m"))
      assert(math.abs(g.getAs[Double]("delta") -
        (r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b"))) < 1e-12)
      assert(math.abs(g.getAs[Double]("log_lambda") -
        r.getAs[Double]("log_lambda")) < 1e-12)
      assert(math.abs(g.getAs[Double]("p_always_valid") -
        r.getAs[Double]("p_always_valid")) < 1e-12)
      assert(math.abs(g.getAs[Double]("theta") - c.getAs[Double]("theta")) < 1e-12)
      assert(math.abs(g.getAs[Double]("delta_cuped") -
        c.getAs[Double]("delta_cuped")) < 1e-12)
      assert(math.abs(g.getAs[Double]("log_lambda_cuped") -
        c.getAs[Double]("log_lambda_cuped")) < 1e-12)
      assert(math.abs(g.getAs[Double]("p_always_valid_cuped") -
        c.getAs[Double]("p_always_valid_cuped")) < 1e-12)
      // single contrast: BH is the identity
      assert(g.getAs[Long]("m") == 1L && g.getAs[Long]("rk") == 1L)
      assert(math.abs(g.getAs[Double]("q_bh") -
        c.getAs[Double]("p_always_valid_cuped")) < 1e-12)
    }
  }

  test("clustered ops with one-subject clusters == subject-level sequential/report") {
    val subj = seqSubjects(("c", 1), ("t1", 2), ("t2", 4))
    val stable = subj.withColumn("unit",
      concat(col("arm"), lit("_"), col("day"), lit("_"),
        col("v"), lit("_"), col("x"), lit("_"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("arm", "day", "v", "x").orderBy("arm"))))
    val gotSeq = MultiArm.sequentialClustered(
      stable, "arm", "day", "v", "unit", looks10, "day", control = "c",
      tau = 0.5, minClusters = 5L, xCol = Some("x")).collect()
    val refSeq = MultiArm.sequential(
      subj, "arm", "day", "v", looks10, "day", control = "c", tau = 0.5,
      minPerArm = 5L, xCol = Some("x"))
      .collect().map(r => (r.getAs[Int]("day"), r.getAs[String]("arm")) -> r).toMap
    assert(gotSeq.nonEmpty && gotSeq.length == refSeq.size)
    gotSeq.foreach { g =>
      val r = refSeq((g.getAs[Int]("day"), g.getAs[String]("arm")))
      assert(g.getAs[Long]("n") == r.getAs[Long]("n"))
      assert(g.getAs[Long]("mixed_m") == 0L)
      Seq("mean", "delta", "log_lambda", "p_always_valid", "theta",
        "delta_cuped", "se_cuped", "log_lambda_cuped",
        "p_always_valid_cuped", "q_bh").foreach { cn =>
        assert(math.abs(g.getAs[Double](cn) - r.getAs[Double](cn)) < 1e-12,
          s"$cn: ${g.getAs[Double](cn)} vs ${r.getAs[Double](cn)}")
      }
      assert(g.getAs[Long]("m") == r.getAs[Long]("m"))
      assert(g.getAs[Long]("rk") == r.getAs[Long]("rk"))
      assert(g.getAs[Boolean]("discovery") == r.getAs[Boolean]("discovery"))
    }
    val gotRep = MultiArm.reportClustered(
      stable, "arm", "v", "unit", control = "c", xCol = Some("x")).collect()
    val refRep = MultiArm.report(
      subj, "arm", "v", control = "c", xCol = Some("x"))
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(gotRep.length == refRep.size)
    gotRep.foreach { g =>
      val r = refRep(g.getAs[String]("arm"))
      assert(g.getAs[Long]("n") == r.getAs[Long]("n"))
      assert(g.getAs[Long]("mixed_m") == 0L)
      Seq("mean", "delta", "se", "z", "p", "theta", "delta_cuped",
        "se_cuped", "z_cuped", "p_cuped", "q_bh").foreach { cn =>
        assert(math.abs(g.getAs[Double](cn) - r.getAs[Double](cn)) < 1e-12,
          s"$cn: ${g.getAs[Double](cn)} vs ${r.getAs[Double](cn)}")
      }
    }
  }

  test("mixed clusters: excluded from the day a second arm touches, counted in mixed_m") {
    val base = clSubjects(2)
    // g0 (own arm a0 from day 1) is invaded by a1 from day 6 on
    val invade = (6 to 10).map(day => ("a1", day, 1.0, 1.0, "g0"))
      .toDF("arm", "day", "v", "x", "geo")
    val got = MultiArm.sequentialClustered(
      base.union(invade), "arm", "day", "v", "geo", looks10, "day",
      control = "a0", tau = 0.5, minClusters = 2L)
      .collect().map(r => r.getAs[Int]("day") -> r).toMap
    val ref = MultiArm.sequentialClustered(
      base.filter(col("geo") =!= "g0"), "arm", "day", "v", "geo", looks10,
      "day", control = "a0", tau = 0.5, minClusters = 2L)
      .collect().map(r => r.getAs[Int]("day") -> r).toMap
    (1 to 5).foreach(d => assert(got(d).getAs[Long]("mixed_m") == 0L))
    (6 to 10).foreach { d =>
      // counted once mixed, and the cluster's contribution is gone: the
      // per-look moments equal the run where g0 never existed
      assert(got(d).getAs[Long]("mixed_m") == 1L)
      assert(got(d).getAs[Long]("n") == ref(d).getAs[Long]("n"))
      Seq("mean", "delta", "log_lambda").foreach { cn =>
        assert(math.abs(got(d).getAs[Double](cn) -
          ref(d).getAs[Double](cn)) < 1e-12, s"day $d $cn")
      }
    }
    // fixed horizon: the mixed cluster is excluded everywhere
    val gotR = MultiArm.reportClustered(
      base.union(invade), "arm", "v", "geo", control = "a0").collect()
    val refR = MultiArm.reportClustered(
      base.filter(col("geo") =!= "g0"), "arm", "v", "geo", control = "a0")
      .collect()
    assert(gotR.head.getAs[Long]("mixed_m") == 1L)
    assert(refR.head.getAs[Long]("mixed_m") == 0L)
    gotR.zip(refR).foreach { case (g, r) =>
      assert(g.getAs[String]("arm") == r.getAs[String]("arm"))
      assert(g.getAs[Long]("n") == r.getAs[Long]("n"))
      Seq("mean", "delta", "se", "p").foreach { cn =>
        assert(math.abs(g.getAs[Double](cn) - r.getAs[Double](cn)) < 1e-12)
      }
    }
  }

  test("clustered refusals by name: null arm, missing control") {
    val base = clSubjects(3)
    val withNull = base.union(
      Seq((null: String, 1, 1.0, 1.0, "g0")).toDF("arm", "day", "v", "x", "geo"))
    val e1 = intercept[IllegalArgumentException](
      MultiArm.reportClustered(withNull, "arm", "v", "geo", control = "a0"))
    assert(e1.getMessage.contains("contains nulls"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MultiArm.sequentialClustered(withNull, "arm", "day", "v", "geo",
        looks10, "day", control = "a0", tau = 0.5))
    assert(e2.getMessage.contains("contains nulls"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      MultiArm.sequentialClustered(base, "arm", "day", "v", "geo",
        looks10, "day", control = "zz", tau = 0.5))
    assert(e3.getMessage.contains("control arm 'zz'"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      MultiArm.reportClustered(base, "arm", "v", "geo", control = "zz"))
    assert(e4.getMessage.contains("control arm 'zz'"), e4.getMessage)
  }

  test("sequential refusals shared with report: nulls, control, levels, tau, fdr") {
    val ok = seqSubjects(("c", 1), ("t", 2))
    def call(df: org.apache.spark.sql.DataFrame, control: String = "c",
        tau: Double = 0.5, fdr: Double = 0.05) =
      MultiArm.sequential(df, "arm", "day", "v", looks10, "day", control,
        tau, fdr)
    val e1 = intercept[IllegalArgumentException](call(ok, control = "zz"))
    assert(e1.getMessage.contains("control arm 'zz'"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      call(ok.withColumn("arm",
        when(col("arm") === "t", lit(null).cast("string")).otherwise(col("arm")))))
    assert(e2.getMessage.contains("contains nulls"), e2.getMessage)
    val many = (0 until 70).flatMap(a => Seq((s"a$a", 1, 1.0, 0.0)))
      .toDF("arm", "day", "v", "x")
    val e3 = intercept[IllegalArgumentException](call(many, control = "a0"))
    assert(e3.getMessage.contains("segmentation"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](call(ok, tau = 0.0))
    assert(e4.getMessage.contains("tau"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException](call(ok, fdr = 1.5))
    assert(e5.getMessage.contains("fdr"), e5.getMessage)
    // report's null refusal matches (same wording channel)
    val e6 = intercept[IllegalArgumentException](MultiArm.report(
      Seq((null.asInstanceOf[String], 1.0), ("c", 0.0), ("c", 1.0),
        ("t", 0.0), ("t", 1.0)).toDF("arm", "y"), "arm", "y", control = "c"))
    assert(e6.getMessage.contains("contains nulls"), e6.getMessage)
  }
}
