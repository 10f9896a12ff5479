package graft

import graft.ops.Survival

/** [[Survival.kaplanMeier]] — hand-computed risk sets and survival
  * products on the textbook right-censored example, censoring-only
  * degeneracy, and layout determinism. */
class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  test("KM curve matches the hand-computed example with interleaved censoring") {
    // durations: 1(event) 2(censor) 3(event) 4(event) 5(censor)
    // t=1: n=5 d=1 S=4/5=0.8
    // t=3: n=3 d=1 S=0.8*2/3=0.5333...
    // t=4: n=2 d=1 S=0.5333*1/2=0.2666...
    val subjects = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 1), (5L, 0))
      .toDF("t_days", "is_event")
    val got = Survival.kaplanMeier(subjects, "t_days", "is_event")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ==
      Seq((1L, 5L, 1L), (3L, 3L, 1L), (4L, 2L, 1L)))
    val s = got.map(_._4)
    assert(math.abs(s(0) - 0.8) < 1e-12)
    assert(math.abs(s(1) - 0.8 * 2 / 3) < 1e-12)
    assert(math.abs(s(2) - 0.8 * 2 / 3 * 0.5) < 1e-12)
  }

  test("ties at one time collapse into one step; censors at an event time leave AFTER it") {
    // t=2: 2 events + 1 censor out of 4 at risk -> S = (1 - 2/4) = 0.5
    // (the censor at t=2 was still at risk at t=2 — standard convention)
    val subjects = Seq((2L, 1), (2L, 1), (2L, 0), (7L, 0)).toDF("t", "e")
    val got = Survival.kaplanMeier(subjects, "t", "e").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 4L && got(0).getLong(2) == 2L)
    assert(math.abs(got(0).getDouble(3) - 0.5) < 1e-12)
  }

  test("an absorbing step (every at-risk subject converts) lands survival exactly 0") {
    val subjects = Seq((1L, 1), (2L, 1), (2L, 1)).toDF("t", "e")
    val got = Survival.kaplanMeier(subjects, "t", "e").orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq.map(g => (g._1, g._2, g._3)) == Seq((1L, 3L, 1L), (2L, 2L, 2L)))
    assert(math.abs(got(0)._4 - 2.0 / 3) < 1e-12)
    assert(got(1)._4 == 0.0)
  }

  test("stratified KM reproduces each group's standalone curve") {
    val subjects = (
      Seq((1L, 1), (2L, 0), (3L, 1), (4L, 1), (5L, 0)).map { case (t, e) => ("A", t, e) } ++
        Seq((1L, 1), (2L, 1), (2L, 1)).map { case (t, e) => ("B", t, e) })
      .toDF("grp", "t", "e")
    val got = Survival.kaplanMeierBy(subjects, "grp", "t", "e")
      .orderBy("g", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val a = got.filter(_._1 == "A")
    assert(a.map(x => (x._2, x._3, x._4)).toSeq ==
      Seq((1L, 5L, 1L), (3L, 3L, 1L), (4L, 2L, 1L)))
    assert(math.abs(a(2)._5 - 0.8 * 2 / 3 * 0.5) < 1e-12)
    val b = got.filter(_._1 == "B")
    assert(b.map(x => (x._2, x._3, x._4)).toSeq == Seq((1L, 3L, 1L), (2L, 2L, 2L)))
    assert(b(1)._5 == 0.0, "absorbing step per group")
  }

  test("log-rank matches the hand-computed two-group table") {
    // A: events at 1, 2; B: events at 2, 3
    // t=1: n=4 d=1 dA=1 nA=2 -> E=.5 V=.25
    // t=2: n=3 d=2 dA=1 nA=1 -> E=2/3 V=2/9
    // t=3: n=1 -> excluded (variance needs n>1)
    // chi2 = (2 - 7/6)^2 / (0.25 + 2/9) = 1.470588...
    val subjects = Seq(
      ("A", 1L, 1), ("A", 2L, 1), ("B", 2L, 1), ("B", 3L, 1))
      .toDF("grp", "t", "e")
    val r = Survival.logRank(subjects, "grp", "t", "e", focal = "A").collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 7.0 / 6) < 1e-12)
    assert(math.abs(r.getDouble(3) - (0.25 + 2.0 / 9)) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.4705882352941178) < 1e-9)
    // identical groups score ~zero
    val same = Seq(("A", 1L, 1), ("A", 3L, 1), ("B", 1L, 1), ("B", 3L, 1))
      .toDF("grp", "t", "e")
    assert(Survival.logRank(same, "grp", "t", "e", "A").collect()(0).getDouble(4) < 1e-12)
  }

  test("weighted log-rank matches the hand-computed Gehan table") {
    // same fixture as the log-rank test; Gehan weights w = n_t:
    // t=1: w=4, OE=0.5, V=.25; t=2: w=3, OE=1/3, V=2/9
    // Zw = 4*.5 + 3/3 = 3; Vw = 16*.25 + 9*2/9 = 6; chi2_gehan = 9/6 = 1.5
    val subjects = Seq(
      ("A", 1L, 1), ("A", 2L, 1), ("B", 2L, 1), ("B", 3L, 1))
      .toDF("grp", "t", "e")
    val r = Survival.logRankWeighted(subjects, "grp", "t", "e", focal = "A").collect()(0)
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) - 1.4705882352941178) < 1e-9,
      "w = 1 column must equal the unweighted statistic")
    assert(math.abs(r.getDouble(2) - 1.5) < 1e-12)
  }

  test("Cox two-group fit: Newton lands the score root; symmetric groups give beta 0") {
    // skewed fixture: A events early, B late + censoring
    val subjects = Seq(
      ("A", 1L, 1), ("A", 1L, 1), ("A", 2L, 1), ("A", 4L, 0),
      ("B", 2L, 1), ("B", 3L, 1), ("B", 4L, 1), ("B", 4L, 0))
      .toDF("grp", "t", "e")
    val r = Survival.coxTwoGroup(subjects, "grp", "t", "e", focal = "A").collect()(0)
    val beta = r.getDouble(1)
    // independent check: fold the SAME pooled grid sequentially and
    // assert the returned beta zeroes the score (the defining property)
    def grid(): Seq[(Long, Long, Long, Long)] = {
      val subs = Seq(("A", 1L, 1), ("A", 1L, 1), ("A", 2L, 1), ("A", 4L, 0),
        ("B", 2L, 1), ("B", 3L, 1), ("B", 4L, 1), ("B", 4L, 0))
      val times = subs.filter(_._3 == 1).map(_._2).distinct.sorted
      times.map { t =>
        val atRisk = subs.filter(_._2 >= t)
        val d = subs.count(s => s._2 == t && s._3 == 1)
        val dA = subs.count(s => s._1 == "A" && s._2 == t && s._3 == 1)
        val nA = atRisk.count(_._1 == "A")
        (d.toLong, atRisk.size.toLong, dA.toLong, nA.toLong)
      }
    }
    val u = grid().map { case (dt, nt, da, na) =>
      val n0 = (nt - na).toDouble; val ea = na * math.exp(beta)
      da - dt * ea / (ea + n0)
    }.sum
    assert(math.abs(u) < 1e-9, s"score at the fitted beta must be ~0, got $u")
    assert(beta > 0, "A events earlier -> higher hazard -> positive log-HR")
    assert(math.abs(r.getDouble(2) - math.exp(beta)) < 1e-12)
    assert(r.getDouble(3) > 0 && r.getDouble(4) >= 0)
    // exactly mirrored groups: beta is 0 by symmetry (U(0) = 0 exactly)
    val same = Seq(("A", 1L, 1), ("A", 3L, 1), ("B", 1L, 1), ("B", 3L, 1))
      .toDF("grp", "t", "e")
    assert(Survival.coxTwoGroup(same, "grp", "t", "e", "A").collect()(0).getDouble(1) == 0.0)
    // the declared-judgement cap refuses instead of collecting unbounded grids
    val e = intercept[IllegalArgumentException](
      Survival.coxTwoGroup(subjects, "grp", "t", "e", "A", maxTimes = 2).collect())
    assert(e.getMessage.contains("maxTimes"))
  }

  test("competing risks match the hand-computed Aalen-Johansen table and the AJ identity") {
    // (t, cause): cause 1/2 compete, 0 censors
    // t=1: n=5 d1=1 d2=1 -> S(0-)=1, cif1=.2 cif2=.2, S(1)=.6
    // t=2: n=3 d1=1 (plus one censor) -> cif1=.2+.6/3=.4, cif2=.2, S(2)=.4
    // identity: cif1+cif2 = 1 - S_any at every step
    val subjects = Seq((1L, 1), (1L, 2), (2L, 0), (2L, 1), (3L, 0))
      .toDF("t", "cause")
    val got = Survival.competingRisks(subjects, "t", "cause")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.map(x => (x._1, x._2, x._3, x._4)).toSeq ==
      Seq((1L, 5L, 1L, 1L), (2L, 3L, 1L, 0L)))
    assert(math.abs(got(0)._5 - 0.2) < 1e-12 && math.abs(got(0)._6 - 0.2) < 1e-12)
    assert(math.abs(got(1)._5 - 0.4) < 1e-12 && math.abs(got(1)._6 - 0.2) < 1e-12)
    // AJ identity against the any-cause KM on the same subjects
    val anyCause = subjects.selectExpr("t", "CAST(cause > 0 AS INT) AS e")
    val km = Survival.kaplanMeier(anyCause, "t", "e")
      .orderBy("t").collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    got.foreach { case (t, _, _, _, c1, c2) =>
      assert(math.abs((c1 + c2) - (1.0 - km(t))) < 1e-12,
        s"CIF1+CIF2 must equal 1 - S_any at t=$t")
    }
  }

  test("coxPH with one binary covariate reproduces coxTwoGroup exactly") {
    // the matrix Newton must special-case to the scalar fit: same grid,
    // same Breslow handling, same 8 steps from beta = 0
    val subjects = (1L to 300L).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val t = (i % 17) + (if (g == "a") 2 else 0)
      val e = if (i % 3 == 0) 0 else 1
      (g, t, e, if (g == "a") 1.0 else 0.0)
    }.toDF("g", "t", "e", "x")
    val two = Survival.coxTwoGroup(subjects, "g", "t", "e", focal = "a")
      .select("beta", "se", "wald_chi2").head
    val multi = Survival.coxPH(subjects, Seq("x"), "t", "e", ties = "breslow")
      .select("beta", "se", "wald_chi2").head
    assert(math.abs(two.getDouble(0) - multi.getDouble(0)) < 1e-9,
      s"beta: two-group ${two.getDouble(0)} vs matrix ${multi.getDouble(0)}")
    assert(math.abs(two.getDouble(1) - multi.getDouble(1)) < 1e-9)
    assert(math.abs(two.getDouble(2) - multi.getDouble(2)) < 1e-9)
  }

  test("coxPH: two covariates recover signs on a constructed effect; collinear input refuses") {
    // x1 strongly accelerates events (smaller t), x2 is pure noise
    val rnd = new scala.util.Random(7)
    val subjects = (1 to 500).map { _ =>
      val x1 = if (rnd.nextBoolean()) 1.0 else 0.0
      val x2 = rnd.nextDouble()
      val base = 5.0 + 10.0 * rnd.nextDouble()
      val t = math.max(1L, (base * (if (x1 > 0) 0.4 else 1.0)).toLong)
      (t, 1, x1, x2)
    }.toDF("t", "e", "x1", "x2")
    val fit = Survival.coxPH(subjects, Seq("x1", "x2"), "t", "e")
      .orderBy("covariate").collect()
    val b1 = fit.find(_.getString(0) == "x1").get.getDouble(2)
    assert(b1 > 0.5, s"accelerating covariate must fit a positive log-hazard, got $b1")
    assert(fit.forall(r => r.getDouble(4) > 0.0), "SEs must be positive")
    // perfectly collinear covariates make the information singular
    val dup = subjects.withColumn("x3", org.apache.spark.sql.functions.col("x1"))
    val e = intercept[IllegalArgumentException](
      Survival.coxPH(dup, Seq("x1", "x3"), "t", "e").collect())
    assert(e.getMessage.contains("singular"))
  }

  test("coxPH stratified: one stratum ≡ unstratified; strata absorb baseline confounding") {
    val rnd = new scala.util.Random(11)
    val subjects = (1 to 400).map { _ =>
      val x = if (rnd.nextBoolean()) 1.0 else 0.0
      val t = math.max(1L, (8.0 + 10.0 * rnd.nextDouble() - 4.0 * x).toLong)
      ("only", t, 1, x)
    }.toDF("g", "t", "e", "x")
    val flat = Survival.coxPH(subjects, Seq("x"), "t", "e")
      .select("beta", "se").head
    val strat = Survival.coxPH(subjects, Seq("x"), "t", "e", strataCol = Some("g"))
      .select("beta", "se").head
    assert(math.abs(flat.getDouble(0) - strat.getDouble(0)) < 1e-9,
      "a single stratum must reproduce the unstratified fit exactly")
    assert(math.abs(flat.getDouble(1) - strat.getDouble(1)) < 1e-9)

    // confounding: stratum "fast" converts much sooner AND holds most of
    // the x=1 subjects; x has NO effect within either stratum. The
    // pooled fit blames x for the stratum's speed; the stratified fit
    // must not.
    val confounded = ((1 to 300).map { i =>
      ("fast", (1 + i % 4).toLong, 1, if (i % 10 < 8) 1.0 else 0.0)
    } ++ (1 to 300).map { i =>
      ("slow", (20 + i % 4).toLong, 1, if (i % 10 < 2) 1.0 else 0.0)
    }).toDF("g", "t", "e", "x")
    val pooled = Survival.coxPH(confounded, Seq("x"), "t", "e")
      .select("beta").head.getDouble(0)
    val perStratum = Survival.coxPH(confounded, Seq("x"), "t", "e",
      strataCol = Some("g")).select("beta").head.getDouble(0)
    assert(pooled > 0.5, s"pooled fit must show the spurious effect, got $pooled")
    assert(math.abs(perStratum) < 0.15,
      s"stratified fit must absorb the baseline difference, got $perStratum")
  }

  test("coxPH ties: Efron ≡ Breslow on tie-free data; they genuinely differ under ties") {
    // tie-free: every subject a distinct duration — Efron's j-loop runs
    // exactly one j=0 term per time (frac = 0), so both methods solve the
    // SAME score equation
    val rnd = new scala.util.Random(13)
    val tieFree = (1 to 200).map { i =>
      (1000L + i * 3 + (i % 2), if (rnd.nextBoolean()) 1 else 0,
        if (i % 2 == 0) 1.0 else 0.0, rnd.nextDouble())
    }.toDF("t", "e", "x1", "x2")
    val ef = Survival.coxPH(tieFree, Seq("x1", "x2"), "t", "e", ties = "efron")
      .orderBy("covariate").collect()
    val br = Survival.coxPH(tieFree, Seq("x1", "x2"), "t", "e", ties = "breslow")
      .orderBy("covariate").collect()
    ef.zip(br).foreach { case (a, b) =>
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-12,
        s"tie-free beta: efron ${a.getDouble(2)} vs breslow ${b.getDouble(2)}")
      assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-12, "se")
    }
    // heavy ties: integer-granular durations — the methods must DISAGREE
    // (if they did not, the Efron path would not be exercising its math)
    // and Efron must sit FARTHER from 0 (Breslow attenuates toward 0)
    val tied = (1 to 400).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      val t = math.max(1L, ((i % 5) + 1 + (if (x > 0) 0 else 2)).toLong)
      (t, 1, x)
    }.toDF("t", "e", "x")
    val efT = Survival.coxPH(tied, Seq("x"), "t", "e", ties = "efron")
      .select("beta").head.getDouble(0)
    val brT = Survival.coxPH(tied, Seq("x"), "t", "e", ties = "breslow")
      .select("beta").head.getDouble(0)
    assert(math.abs(efT - brT) > 1e-4,
      s"heavy ties must separate the methods: efron $efT vs breslow $brT")
    assert(math.abs(efT) > math.abs(brT),
      s"Breslow biases toward 0 under ties: efron $efT vs breslow $brT")
    // an invalid ties value refuses by name
    val bad = intercept[IllegalArgumentException](
      Survival.coxPH(tied, Seq("x"), "t", "e", ties = "exact"))
    assert(bad.getMessage.contains("ties"))
  }

  test("coxPH refuses a perfectly separating covariate with the diagnosis named") {
    // x = 1 subjects ALL convert before every x = 0 subject: the partial
    // likelihood is monotone in beta (its MLE is +inf) — any fixed
    // iteration count reports an artifact, so the fit must refuse and
    // name the covariate
    val separated = ((1 to 100).map(i => ((i % 10) + 1L, 1, 1.0)) ++
      (1 to 100).map(i => ((i % 10) + 50L, 1, 0.0))).toDF("t", "e", "xsep")
    val e = intercept[IllegalArgumentException](
      Survival.coxPH(separated, Seq("xsep"), "t", "e").collect())
    assert(e.getMessage.contains("xsep"), e.getMessage)
    assert(e.getMessage.toLowerCase.contains("separat"), e.getMessage)
    // positive control: a strong-but-finite effect converges fine in the
    // same 8 steps (overlapping event ranges keep the MLE finite)
    val strong = ((1 to 100).map(i => ((i % 20) + 1L, 1, 1.0)) ++
      (1 to 100).map(i => ((i % 30) + 5L, 1, 0.0))).toDF("t", "e", "x")
    val fit = Survival.coxPH(strong, Seq("x"), "t", "e").select("beta").head.getDouble(0)
    assert(fit > 0.5, s"strong effect must fit, got $fit")
  }

  test("coxPH firth: matches a finite-difference Firth Newton (Breslow and Efron, p=1)") {
    // independent replay: U and I computed directly from the subject
    // list; the penalty term ½·I'(β)/I(β) via CENTRAL DIFFERENCE of I —
    // if the engine's closed-form third-central-moment tensor were wrong
    // in any term, the two Newtons would land on different β
    val data = (1 to 60).map { i =>
      val x = if (i % 3 == 0) 1.0 else 0.0
      val t = ((i % 7) + 1 + (if (x > 0) 0 else 3)).toLong
      (t, if (i % 5 == 0) 0 else 1, x)
    }
    def fdFirth(efron: Boolean): Double = {
      val times = data.filter(_._2 == 1).map(_._1).distinct.sorted
      def sums(b: Double, t: Long): (Double, Double, Double) = {
        val rs = data.filter(_._1 >= t)
        (rs.map(s => math.exp(b * s._3)).sum,
          rs.map(s => s._3 * math.exp(b * s._3)).sum,
          rs.map(s => s._3 * s._3 * math.exp(b * s._3)).sum)
      }
      def esums(b: Double, t: Long): (Double, Double, Double) = {
        val ev = data.filter(s => s._1 == t && s._2 == 1)
        (ev.map(s => math.exp(b * s._3)).sum,
          ev.map(s => s._3 * math.exp(b * s._3)).sum,
          ev.map(s => s._3 * s._3 * math.exp(b * s._3)).sum)
      }
      def ui(b: Double): (Double, Double) = {
        var u = 0.0; var fi = 0.0
        times.foreach { t =>
          val ev = data.filter(s => s._1 == t && s._2 == 1)
          val d = ev.length
          val sx = ev.map(_._3).sum
          val (s0, s1, s2) = sums(b, t)
          if (!efron) {
            u += sx - d * s1 / s0
            fi += d * (s2 / s0 - (s1 / s0) * (s1 / s0))
          } else {
            val (e0, e1, e2) = esums(b, t)
            u += sx
            (0 until d).foreach { j =>
              val f = j.toDouble / d
              val (z0, z1, z2) = (s0 - f * e0, s1 - f * e1, s2 - f * e2)
              u -= z1 / z0
              fi += z2 / z0 - (z1 / z0) * (z1 / z0)
            }
          }
        }
        (u, fi)
      }
      var b = 0.0
      val h = 1e-5
      (1 to 8).foreach { _ =>
        val (u, fi) = ui(b)
        val dI = (ui(b + h)._2 - ui(b - h)._2) / (2 * h)
        b += (u + 0.5 * dI / fi) / fi
      }
      b
    }
    val df = data.toDF("t", "e", "x")
    val brEngine = Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow",
      firth = true).select("beta").head.getDouble(0)
    assert(math.abs(brEngine - fdFirth(efron = false)) < 1e-6,
      s"breslow firth: engine $brEngine vs finite-difference ${fdFirth(efron = false)}")
    val efEngine = Survival.coxPH(df, Seq("x"), "t", "e", ties = "efron",
      firth = true).select("beta").head.getDouble(0)
    assert(math.abs(efEngine - fdFirth(efron = true)) < 1e-6,
      s"efron firth: engine $efEngine vs finite-difference ${fdFirth(efron = true)}")
    // and the penalty genuinely moved the estimate off the MLE
    val mle = Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow")
      .select("beta").head.getDouble(0)
    assert(math.abs(mle - brEngine) > 1e-4,
      s"firth must differ from the MLE here: $mle vs $brEngine")
  }

  test("coxPH firth: a separating covariate gets a FINITE estimate; MLE-friendly data stays close") {
    // the same construction the refusal spec uses: x = 1 subjects all
    // convert before every x = 0 subject — the unpenalized MLE is +inf
    // (and coxPH refuses); Firth's Jeffreys penalty gives a finite mode
    val separated = ((1 to 100).map(i => ((i % 10) + 1L, 1, 1.0)) ++
      (1 to 100).map(i => ((i % 10) + 50L, 1, 0.0))).toDF("t", "e", "xsep")
    val fit = Survival.coxPH(separated, Seq("xsep"), "t", "e",
      iters = 20, firth = true).head
    val beta = fit.getDouble(2)
    assert(java.lang.Double.isFinite(beta) && beta > 1.0,
      s"penalized estimate must be finite and strongly positive, got $beta")
    assert(fit.getDouble(4) > 0.0 && java.lang.Double.isFinite(fit.getDouble(4)),
      "SE must be finite under the penalty")
    // well-conditioned data: Firth is a small-bias correction, not a new
    // answer — estimates agree to first order (and the p=2 tensor path
    // converges under the default Efron ties)
    val rnd = new scala.util.Random(17)
    val strong = (1 to 400).map { _ =>
      val x1 = if (rnd.nextBoolean()) 1.0 else 0.0
      val x2 = rnd.nextDouble()
      val t = math.max(1L, (6.0 + 8.0 * rnd.nextDouble() - 3.0 * x1).toLong)
      (t, 1, x1, x2)
    }.toDF("t", "e", "x1", "x2")
    val mle = Survival.coxPH(strong, Seq("x1", "x2"), "t", "e")
      .orderBy("covariate").collect().map(_.getDouble(2))
    val penalized = Survival.coxPH(strong, Seq("x1", "x2"), "t", "e",
      firth = true).orderBy("covariate").collect().map(_.getDouble(2))
    mle.zip(penalized).foreach { case (m, f) =>
      assert(math.abs(m - f) < 0.1, s"firth must stay near the MLE: $m vs $f")
    }
  }

  test("coxSurvival: Breslow baseline matches a direct replica; curves behave") {
    // independent replica: fit beta via coxTwoGroup (== coxPH breslow,
    // pinned above), then compute S0 per event time and the Breslow
    // H0 cumulative in plain Scala — engine rows must match to 1e-9
    val data = (1 to 80).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      (((i % 9) + 1 + (if (x > 0) 0 else 2)).toLong, if (i % 7 == 0) 0 else 1, x,
        if (x > 0) "a" else "b")
    }
    val df = data.map(d => (d._1, d._2, d._3)).toDF("t", "e", "x")
    val beta = Survival.coxTwoGroup(
      data.map(d => (d._4, d._1, d._2)).toDF("g", "t", "e"), "g", "t", "e", focal = "a")
      .select("beta").head.getDouble(0)
    val times = data.filter(_._2 == 1).map(_._1).distinct.sorted
    var h = 0.0
    val expected = times.map { t =>
      val s0 = data.filter(_._1 >= t).map(s => math.exp(beta * s._3)).sum
      val d = data.count(s => s._1 == t && s._2 == 1)
      h += d / s0
      t -> h
    }.toMap
    val got = Survival.coxSurvival(df, Seq("x"), "t", "e",
      profiles = Seq("ctrl" -> Seq(0.0), "treat" -> Seq(1.0)), ties = "breslow")
      .collect()
    assert(got.length == times.size * 2)
    got.foreach { r =>
      val t = r.getAs[Long]("t")
      assert(math.abs(r.getAs[Double]("h0_cum") - expected(t)) < 1e-9,
        s"h0 at t=$t: ${r.getAs[Double]("h0_cum")} vs ${expected(t)}")
      val lp = if (r.getAs[String]("profile") == "treat") beta else 0.0
      assert(math.abs(r.getAs[Double]("survival") -
        math.exp(-expected(t) * math.exp(lp))) < 1e-9)
    }
    // curve sanity: survival in (0,1], nonincreasing in t per profile,
    // and the higher-risk profile sits strictly below at every time
    val byProfile = got.groupBy(_.getAs[String]("profile"))
    byProfile.values.foreach { rows =>
      val s = rows.sortBy(_.getAs[Long]("t")).map(_.getAs[Double]("survival"))
      assert(s.forall(v => v > 0.0 && v <= 1.0))
      assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-12 })
    }
    if (beta > 0) {
      val treatByT = byProfile("treat").map(r => r.getAs[Long]("t") ->
        r.getAs[Double]("survival")).toMap
      byProfile("ctrl").foreach { r =>
        assert(treatByT(r.getAs[Long]("t")) < r.getAs[Double]("survival"))
      }
    }
  }

  test("coxSurvival: Efron baseline differs under ties, agrees tie-free; strata get own baselines") {
    val tied = (1 to 200).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      (((i % 4) + 1 + (if (x > 0) 0 else 1)).toLong, 1, x)
    }.toDF("t", "e", "x")
    val prof = Seq("base" -> Seq(0.0))
    val ef = Survival.coxSurvival(tied, Seq("x"), "t", "e", prof, ties = "efron")
      .orderBy("t").collect().map(_.getAs[Double]("h0_cum"))
    val br = Survival.coxSurvival(tied, Seq("x"), "t", "e", prof, ties = "breslow")
      .orderBy("t").collect().map(_.getAs[Double]("h0_cum"))
    assert(ef.zip(br).exists { case (a, b) => math.abs(a - b) > 1e-6 },
      "heavy ties must separate the Efron and Breslow baselines")
    // (no ordering claim: each baseline rides its OWN fitted β — the
    // per-time "Efron ≥ Breslow" inequality only holds at matched β)
    val tieFree = (1 to 60).map { i =>
      (1000L + i * 7, if (i % 5 == 0) 0 else 1, if (i % 2 == 0) 1.0 else 0.0)
    }.toDF("t", "e", "x")
    val ef2 = Survival.coxSurvival(tieFree, Seq("x"), "t", "e", prof, ties = "efron")
      .orderBy("t").collect().map(_.getAs[Double]("h0_cum"))
    val br2 = Survival.coxSurvival(tieFree, Seq("x"), "t", "e", prof, ties = "breslow")
      .orderBy("t").collect().map(_.getAs[Double]("h0_cum"))
    ef2.zip(br2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }

    // stratified: each stratum carries its OWN baseline — the fast
    // stratum's survival at its last event time is far below the slow's
    val strat = ((1 to 100).map(i => ("fast", (1 + i % 3).toLong, 1,
      if (i % 2 == 0) 1.0 else 0.0)) ++
      (1 to 100).map(i => ("slow", (30 + i % 3).toLong, 1,
        if (i % 2 == 0) 1.0 else 0.0))).toDF("g", "t", "e", "x")
    val curves = Survival.coxSurvival(strat, Seq("x"), "t", "e", prof,
      strataCol = Some("g")).collect()
    assert(curves.map(_.getAs[String]("stratum")).toSet == Set("fast", "slow"))
    val lastByStratum = curves.groupBy(_.getAs[String]("stratum")).map {
      case (g, rows) => g -> rows.maxBy(_.getAs[Long]("t")).getAs[Double]("survival")
    }
    assert(lastByStratum("fast") < 0.2 && lastByStratum("slow") < 0.2,
      "all-events strata must drive survival low by their last event")
    // refusals
    assert(intercept[IllegalArgumentException](
      Survival.coxSurvival(tieFree, Seq("x"), "t", "e", Seq.empty))
      .getMessage.contains("profile"))
    assert(intercept[IllegalArgumentException](
      Survival.coxSurvival(tieFree, Seq("x"), "t", "e", Seq("p" -> Seq(1.0, 2.0))))
      .getMessage.contains("covariate value"))
    assert(intercept[IllegalArgumentException](
      Survival.coxSurvival(tieFree, Seq("x"), "t", "e",
        Seq("p" -> Seq(0.0), "p" -> Seq(1.0))))
      .getMessage.contains("distinct"))
  }

  test("coxPH counting-process: matches an interval-risk-set replica; start=0 ≡ plain") {
    // independent replica on random (start, stop] interval data, p=1
    // Breslow: risk set at u = {start < u ≤ stop}, 8 Newton steps —
    // if the signed entry-mass walk dropped or double-counted any
    // interval, the two fits would land on different β
    val rnd = new scala.util.Random(23)
    val data = (1 to 150).map { i =>
      val start = rnd.nextInt(6).toLong
      val stop = start + 1 + rnd.nextInt(10)
      (start, stop, if (rnd.nextDouble() < 0.8) 1 else 0,
        if (i % 2 == 0) 1.0 else 0.0)
    }
    def replica(): Double = {
      val times = data.filter(_._3 == 1).map(_._2).distinct.sorted
      def ui(b: Double): (Double, Double) = {
        var u = 0.0; var fi = 0.0
        times.foreach { t =>
          val ev = data.filter(s => s._2 == t && s._3 == 1)
          val rs = data.filter(s => s._1 < t && t <= s._2)
          val d = ev.length
          val s0 = rs.map(s => math.exp(b * s._4)).sum
          val s1 = rs.map(s => s._4 * math.exp(b * s._4)).sum
          val s2 = rs.map(s => s._4 * s._4 * math.exp(b * s._4)).sum
          u += ev.map(_._4).sum - d * s1 / s0
          fi += d * (s2 / s0 - (s1 / s0) * (s1 / s0))
        }
        (u, fi)
      }
      var b = 0.0
      (1 to 8).foreach { _ => val (u, fi) = ui(b); b += u / fi }
      b
    }
    val df = data.toDF("t0", "t", "e", "x")
    val got = Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow",
      startCol = Some("t0")).select("beta").head.getDouble(0)
    assert(math.abs(got - replica()) < 1e-9,
      s"counting-process beta: engine $got vs replica ${replica()}")
    // start = 0 on 1-based event times ≡ the plain duration fit, exactly
    // (and under the default Efron ties + Firth too — same code path)
    val plainData = (1 to 120).map { i =>
      (0L, ((i % 9) + 1).toLong, if (i % 6 == 0) 0 else 1,
        if (i % 3 == 0) 1.0 else 0.0)
    }
    val pdf = plainData.toDF("t0", "t", "e", "x")
    Seq(("efron", false), ("breslow", false), ("efron", true)).foreach {
      case (ties, firth) =>
        val a = Survival.coxPH(pdf, Seq("x"), "t", "e", ties = ties, firth = firth)
          .select("beta", "se").head
        val b = Survival.coxPH(pdf, Seq("x"), "t", "e", ties = ties, firth = firth,
          startCol = Some("t0")).select("beta", "se").head
        assert(math.abs(a.getDouble(0) - b.getDouble(0)) < 1e-12, s"$ties/$firth beta")
        assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-12, s"$ties/$firth se")
    }
    // zero-length interval refuses
    val bad = Seq((5L, 5L, 1, 1.0)).toDF("t0", "t", "e", "x")
    assert(intercept[IllegalArgumentException](
      Survival.coxPH(bad, Seq("x"), "t", "e", startCol = Some("t0")))
      .getMessage.contains("intervals"))
  }

  test("coxPH counting-process: kills immortal-time bias that the naive coding creates") {
    // null world: NOBODY's hazard depends on treatment, but treatment is
    // RANDOMIZED at day 5 among subjects still at risk then. Coding
    // 'ever treated' as a baseline covariate credits treatment with the
    // guaranteed pre-treatment survival (immortal time) — a spurious
    // protective effect; splitting each treated subject at day 5 (x=0
    // before, x=1 after) removes it.
    val rnd = new scala.util.Random(31)
    val subjects = (1 to 800).map { _ =>
      val t = 1L + rnd.nextInt(14) // uniform event days, no true effect
      val treated = t > 5 && rnd.nextBoolean() // coin among day-5 survivors
      (t, 1, treated)
    }
    val naive = Survival.coxPH(
      subjects.map(s => (s._1, s._2, if (s._3) 1.0 else 0.0)).toDF("t", "e", "x"),
      Seq("x"), "t", "e").select("beta").head.getDouble(0)
    assert(naive < -0.4,
      s"the naive ever-treated fit must show the spurious protection, got $naive")
    // counting-process: everyone (0, min(t,5)] untreated; treated
    // subjects add (5, t] with x = 1, never-treated survivors add it
    // with x = 0
    val split = subjects.flatMap { case (t, e, treated) =>
      if (t <= 5) Seq((0L, t, e, 0.0))
      else Seq((0L, 5L, 0, 0.0), (5L, t, e, if (treated) 1.0 else 0.0))
    }.toDF("t0", "t", "e", "x")
    val honest = Survival.coxPH(split, Seq("x"), "t", "e", startCol = Some("t0"))
      .select("beta").head.getDouble(0)
    assert(math.abs(honest) < 0.25,
      s"the counting-process fit must see (near) no effect, got $honest")
  }

  test("coxPH cluster-robust: exact duplicate-cluster invariance; sane on independent subjects") {
    val rnd = new scala.util.Random(41)
    val subjects = (1 to 300).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      (i.toLong, math.max(1L, (7.0 + 9.0 * rnd.nextDouble() - 2.5 * x).toLong),
        if (i % 8 == 0) 0 else 1, x)
    }
    val df = subjects.toDF("id", "t", "e", "x")
    val one = Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow",
      clusterCol = Some("id")).head
    // each subject duplicated 4x UNDER THE SAME CLUSTER ID: beta is
    // unchanged, the model SE halves (wrongly — the rows are not
    // independent), and the cluster-robust SE is EXACTLY invariant
    // (I x4, per-cluster score x4, M x16 → V unchanged)
    val dup = subjects.flatMap(s => Seq.fill(4)(s)).toDF("id", "t", "e", "x")
    val four = Survival.coxPH(dup, Seq("x"), "t", "e", ties = "breslow",
      clusterCol = Some("id")).head
    assert(math.abs(one.getAs[Double]("beta") - four.getAs[Double]("beta")) < 1e-9)
    assert(math.abs(four.getAs[Double]("se") - one.getAs[Double]("se") / 2.0) < 1e-9,
      s"model SE must (wrongly) halve: ${one.getAs[Double]("se")} vs ${four.getAs[Double]("se")}")
    assert(math.abs(four.getAs[Double]("robust_se") - one.getAs[Double]("robust_se")) < 1e-9,
      s"cluster-robust SE must be invariant: ${one.getAs[Double]("robust_se")} vs " +
        s"${four.getAs[Double]("robust_se")}")
    // independent subjects: robust ≈ model (the sandwich collapses)
    val ratio = one.getAs[Double]("robust_se") / one.getAs[Double]("se")
    assert(ratio > 0.65 && ratio < 1.5, s"robust/model ratio $ratio")
    // no cluster column → schema unchanged (no robust_se)
    assert(!Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow")
      .columns.contains("robust_se"))
    // Efron + cluster refuses by name
    assert(intercept[IllegalArgumentException](
      Survival.coxPH(df, Seq("x"), "t", "e", clusterCol = Some("id")))
      .getMessage.contains("breslow"))
  }

  test("coxPH cluster-robust composes with counting-process recurrent events") {
    // Andersen-Gill shape: users contribute several purchase-gap
    // intervals under ONE cluster id — the analysis robust SEs exist for
    val rnd = new scala.util.Random(43)
    val rows = (1 to 120).flatMap { u =>
      val x = if (u % 2 == 0) 1.0 else 0.0
      var t = 0L
      val k = 1 + rnd.nextInt(4)
      (1 to k).map { _ =>
        val gap = 1 + rnd.nextInt(6)
        val r = (u.toLong, t, t + gap, 1, x)
        t += gap
        r
      } :+ ((u.toLong, t, t + 1 + rnd.nextInt(3), 0, x))
    }
    val df = rows.toDF("id", "t0", "t", "e", "x")
    val fit = Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow",
      startCol = Some("t0"), clusterCol = Some("id")).head
    assert(java.lang.Double.isFinite(fit.getAs[Double]("robust_se")) &&
      fit.getAs[Double]("robust_se") > 0.0)
    assert(java.lang.Double.isFinite(fit.getAs[Double]("beta")))
    // within-cluster correlation (repeated gaps per user) should move
    // the robust SE off the independence SE
    assert(math.abs(fit.getAs[Double]("robust_se") - fit.getAs[Double]("se")) > 1e-6)
  }

  test("phAssumption: quiet when hazards are proportional, fires when the effect drifts") {
    // PH holds EXACTLY for exponentials: scaling time = scaling the
    // constant hazard. Deterministic inverse-CDF draws keep the spec
    // stable: t = ceil(−ln(u)·scale) with u on a uniform grid
    val propo = (1 to 400).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      val uu = (i % 200 + 0.5) / 200.0
      (math.max(1L, math.ceil(-math.log(uu) * (if (x > 0) 8.0 else 16.0)).toLong),
        1, x)
    }.toDF("t", "e", "x")
    val ok = Survival.phAssumption(propo, Seq("x"), "t", "e").head
    assert(ok.getAs[Double]("p_ph") > 0.05,
      s"proportional hazards must not fire, p = ${ok.getAs[Double]("p_ph")}")
    assert(!ok.getAs[Boolean]("violated"))
    // drifting effect: x=1 converts fast EARLY then plateaus; x=0 is
    // uniform throughout — beta(t) decays, the score test must fire
    val drift = ((1 to 200).map { i =>
      val early = i % 4 != 0 // 75% of treated events land in days 1-5
      ((if (early) 1 + i % 5 else 30 + i % 20).toLong, 1, 1.0)
    } ++ (1 to 200).map(i => ((1 + i % 40).toLong, 1, 0.0))).toDF("t", "e", "x")
    val bad = Survival.phAssumption(drift, Seq("x"), "t", "e").head
    assert(bad.getAs[Boolean]("violated"),
      s"drifting effect must fire, p = ${bad.getAs[Double]("p_ph")}")
    assert(bad.getAs[Double]("p_ph") < 0.01)
    // multi-covariate: the drifting one is named, the clean one is not
    val rnd = new scala.util.Random(47)
    val two = ((1 to 200).map { i =>
      val early = i % 4 != 0
      ((if (early) 1 + i % 5 else 30 + i % 20).toLong, 1, 1.0, rnd.nextDouble())
    } ++ (1 to 200).map(i => ((1 + i % 40).toLong, 1, 0.0, rnd.nextDouble())))
      .toDF("t", "e", "x", "noise")
    val rows = Survival.phAssumption(two, Seq("x", "noise"), "t", "e")
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("violated")).toMap
    assert(rows("x") && !rows("noise"), rows.toString)
  }

  test("rmstFromCurves: hand-computed step integration, horizon clamp, per-profile isolation") {
    val curves = Seq(
      ("__all", 2L, "p", 0.3, 0.8), ("__all", 5L, "p", 0.9, 0.5),
      ("__all", 3L, "q", 0.2, 0.9)).toDF("stratum", "t", "profile", "h0_cum", "survival")
    val full = Survival.rmstFromCurves(curves, horizon = 10L)
      .collect().map(r => r.getAs[String]("profile") -> r.getAs[Double]("rmst")).toMap
    // p: 1·2 + 0.8·(5−2) + 0.5·(10−5) = 6.9 ; q: 1·3 + 0.9·(10−3) = 9.3
    assert(math.abs(full("p") - 6.9) < 1e-12, s"got ${full("p")}")
    assert(math.abs(full("q") - 9.3) < 1e-12, s"got ${full("q")}")
    // horizon clamp drops later points and truncates the last segment
    val clamped = Survival.rmstFromCurves(curves, horizon = 4L)
      .collect().map(r => r.getAs[String]("profile") -> r.getAs[Double]("rmst")).toMap
    assert(math.abs(clamped("p") - (2.0 + 0.8 * 2)) < 1e-12)
    assert(math.abs(clamped("q") - (3.0 + 0.9 * 1)) < 1e-12)
    assert(intercept[IllegalArgumentException](
      Survival.rmstFromCurves(curves, 0L)).getMessage.contains("horizon"))
  }

  test("all-censored input yields an empty curve; result is layout-proof") {
    val none = Seq((1L, 0), (5L, 0)).toDF("t", "e")
    assert(Survival.kaplanMeier(none, "t", "e").count() == 0)
    val subjects = (1L to 400L).map(i => (i % 37, (i % 3 == 0, 1, 0) match {
      case (true, a, _) => a; case (false, _, b) => b
    })).toDF("t", "e")
    val a = Survival.kaplanMeier(subjects, "t", "e").orderBy("t").collect().toSeq
    val b = Survival.kaplanMeier(subjects.repartition(13), "t", "e")
      .orderBy("t").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("the maxTimes refusal is plan-bounded: the grid collect carries CollectLimit maxTimes+1") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // ResultQueryStage is a leaf wrapper, so node-class traversal stops
    // above the limit — the executed plan STRING carries the whole tree
    val limits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val t = qe.executedPlan.treeString
        if (t.contains("HashAggregate")) limits.add(t)
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // pathological microsecond-granular grid: 400 distinct event times
      val fine = (1 to 400).map(i => (i.toLong, 1, (i % 7).toDouble, if (i % 2 == 0) "A" else "B"))
        .toDF("t", "e", "x", "grp")
      val e1 = intercept[IllegalArgumentException](
        Survival.coxPH(fine, Seq("x"), "t", "e", maxTimes = 5))
      assert(e1.getMessage.contains("maxTimes"))
      val e2 = intercept[IllegalArgumentException](
        Survival.coxTwoGroup(fine, "grp", "t", "e", "A", maxTimes = 5))
      assert(e2.getMessage.contains("maxTimes"))
      // listener delivery is async: poll until the collect plans arrive
      val deadline = System.nanoTime() + 15000000000L
      while (limits.size() < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val got = limits.asScala.toList
      assert(got.count(_.contains("CollectLimit 6")) >= 2,
        s"both grid collects must be CollectLimit 6 (maxTimes+1) plans; saw " +
          s"${got.size} aggregate plans, heads: ${got.map(_.linesIterator.take(4).mkString(" | ")).mkString("\n")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("counting-process validity probe rides the first Newton pass: zero extra jobs") {
    def countJobs(group: String)(action: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try action
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val rnd = new scala.util.Random(7)
    val rows = (1 to 120).map { i =>
      (1L + i % 13, if (rnd.nextBoolean()) 1 else 0, (i % 3).toDouble)
    }
    val plain = rows.toDF("t", "e", "x")
    val iv = rows.map { case (t, e, x) => (-1L, t, e, x) }.toDF("t0", "t", "e", "x")
    val plainJobs = countJobs("cox_plain")(
      Survival.coxPH(plain, Seq("x"), "t", "e", ties = "breslow").collect())
    val cpJobs = countJobs("cox_cp")(
      Survival.coxPH(iv, Seq("x"), "t", "e", ties = "breslow",
        startCol = Some("t0")).collect())
    assert(cpJobs == plainJobs,
      s"counting-process fit must add no probe job: plain=$plainJobs cp=$cpJobs")
    // the observed check still refuses zero-length intervals, by count
    val bad = Seq((5L, 5L, 1, 1.0), (-1L, 3L, 1, 0.0), (-1L, 4L, 0, 1.0))
      .toDF("t0", "t", "e", "x")
    val e = intercept[IllegalArgumentException](
      Survival.coxPH(bad, Seq("x"), "t", "e", ties = "breslow",
        startCol = Some("t0")).collect())
    assert(e.getMessage.contains("zero-length"), e.getMessage)
  }

  test("convergence-bounded Newton: early exit saves full-data passes, beta unchanged") {
    def countJobs(group: String)(action: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try action
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    // well-conditioned two-arm PH fixture: lands in far fewer than 8 passes
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      val x = (i % 2).toDouble
      val t = 1L + (-math.log(rnd.nextDouble()) / (0.05 * math.exp(0.4 * x))).toLong
      (math.min(t, 80L), if (t <= 80L) 1 else 0, x)
    }
    val df = rows.toDF("t", "e", "x")
    // tol = 0 disables the exit (the fixed-8-pass control); the default
    // tol must spend strictly fewer jobs on the same data
    val fixedJobs = countJobs("cox_fixed")(
      Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow", tol = 0.0).collect())
    val earlyJobs = countJobs("cox_early")(
      Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow").collect())
    assert(earlyJobs < fixedJobs,
      s"early exit must save full-data passes: early=$earlyJobs fixed=$fixedJobs")
    // and the answer is the SAME answer (quadratic convergence: the
    // skipped passes move beta by O(tol^2), far below 1e-9)
    val bE = Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow")
      .collect()(0).getAs[Double]("beta")
    val bF = Survival.coxPH(df, Seq("x"), "t", "e", ties = "breslow", tol = 0.0)
      .collect()(0).getAs[Double]("beta")
    assert(math.abs(bE - bF) < 1e-9, s"early=$bE fixed=$bF")
    // the diagnostic reports the pass count under the cap
    val diag = Survival.coxPHDiag(df, Seq("x"), "t", "e", ties = "breslow")
      .collect()(0)
    assert(diag.getAs[Int]("n_iters") < 8 && diag.getAs[Boolean]("converged"),
      s"n_iters=${diag.getAs[Int]("n_iters")}")
    // the two-group fit stops under the same rule and agrees
    val two = Survival.coxTwoGroup(
      df.withColumn("grp",
        org.apache.spark.sql.functions.col("x").cast("int").cast("string")),
      "grp", "t", "e", focal = "1")
      .collect()(0).getAs[Double]("beta")
    assert(math.abs(two - bE) < 1e-8, s"two-group=$two matrix=$bE")
    // Efron default converges under the cap too (the diag is not
    // breslow-specific)
    val diagE = Survival.coxPHDiag(df, Seq("x"), "t", "e").collect()(0)
    assert(diagE.getAs[Int]("n_iters") <= 8 && diagE.getAs[Boolean]("converged"))
  }

  test("warm-start Cox: betaStart re-fit spends strictly fewer jobs, beta unchanged to 1e-9") {
    def countJobs(group: String)(action: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try action
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map { i =>
      val x = (i % 2).toDouble
      val z = (i % 5).toDouble / 4.0
      val t = 1L + (-math.log(rnd.nextDouble()) /
        (0.05 * math.exp(0.5 * x - 0.3 * z))).toLong
      (math.min(t, 90L), if (t <= 90L) 1 else 0, x, z)
    }
    val df = rows.toDF("t", "e", "x", "z")
    // cold fit: persistable frame with covariate/beta
    val cold = Survival.coxPHDiag(df, Seq("x", "z"), "t", "e", ties = "breslow")
    val coldRows = cold.collect()
    val coldIters = coldRows(0).getAs[Int]("n_iters")
    assert(coldIters >= 2, s"fixture must need >1 cold pass, got $coldIters")
    // warm start from the stored fit (name-aligned, order-independent)
    val start = Survival.betaStartFrom(cold, Seq("x", "z"))
    val coldJobs = countJobs("cox_cold")(
      Survival.coxPH(df, Seq("x", "z"), "t", "e", ties = "breslow").collect())
    val warmJobs = countJobs("cox_warm")(
      Survival.coxPH(df, Seq("x", "z"), "t", "e", ties = "breslow",
        betaStart = Some(start)).collect())
    assert(warmJobs < coldJobs,
      s"warm re-fit must spend strictly fewer jobs: warm=$warmJobs cold=$coldJobs")
    val warmRows = Survival.coxPHDiag(df, Seq("x", "z"), "t", "e",
      ties = "breslow", betaStart = Some(start)).collect()
    assert(warmRows(0).getAs[Int]("n_iters") < coldIters)
    coldRows.zip(warmRows).foreach { case (c, w) =>
      assert(c.getAs[String]("covariate") == w.getAs[String]("covariate"))
      assert(math.abs(c.getAs[Double]("beta") - w.getAs[Double]("beta")) < 1e-9,
        s"${c.getAs[String]("covariate")}: cold=${c.getAs[Double]("beta")} " +
          s"warm=${w.getAs[Double]("beta")}")
      assert(math.abs(c.getAs[Double]("se") - w.getAs[Double]("se")) < 1e-9)
    }
    // name alignment: a reordered xCols call still lands the same betas
    val swapped = Survival.coxPH(df, Seq("z", "x"), "t", "e", ties = "breslow",
      betaStart = Some(Survival.betaStartFrom(cold, Seq("z", "x")))).collect()
      .map(r => r.getAs[String]("covariate") -> r.getAs[Double]("beta")).toMap
    coldRows.foreach(c => assert(
      math.abs(swapped(c.getAs[String]("covariate")) - c.getAs[Double]("beta")) < 1e-9))
    // refusals by name: wrong arity, non-finite prior, missing covariate
    val e1 = intercept[IllegalArgumentException](
      Survival.coxPH(df, Seq("x", "z"), "t", "e", ties = "breslow",
        betaStart = Some(Seq(0.1))).collect())
    assert(e1.getMessage.contains("betaStart has 1"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Survival.coxPH(df, Seq("x", "z"), "t", "e", ties = "breslow",
        betaStart = Some(Seq(Double.NaN, 0.0))).collect())
    assert(e2.getMessage.contains("finite"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Survival.betaStartFrom(cold, Seq("x", "missing_cov")))
    assert(e3.getMessage.contains("missing_cov"), e3.getMessage)
  }

  test("rmstFromCurves: a group whose first event exceeds the horizon reports rmst = horizon") {
    val curves = Seq(
      ("__all", 2L, "p", 0.3, 0.8),
      ("__all", 9L, "q", 0.2, 0.9)).toDF("stratum", "t", "profile", "h0_cum", "survival")
    val r = Survival.rmstFromCurves(curves, horizon = 5L)
      .collect().map(r => r.getAs[String]("profile") -> r.getAs[Double]("rmst")).toMap
    assert(math.abs(r("p") - (2.0 + 0.8 * 3)) < 1e-12)
    assert(r("q") == 5.0,
      s"S = 1 through the horizon must integrate to the horizon, got ${r("q")}")
  }

  test("rmstAdjusted: CI covers the discrete-exponential truth on simulated PH arms") {
    // D = ceil(Exp(lam)) has P(D > k) = e^(-lam k) at integer k, so the
    // step-curve truth is closed-form: sum_{k<tau} e^(-lam k)
    val rnd = new scala.util.Random(5)
    val lam0 = 0.02; val hr = 1.6; val tau = 60L
    def draw(lam: Double, arm: Double, n: Int) = (1 to n).map { _ =>
      val d = math.ceil(-math.log(rnd.nextDouble()) / lam).toLong
      (arm, math.min(d, tau), if (d <= tau) 1 else 0)
    }
    val subjects = (draw(lam0, 0.0, 250) ++ draw(lam0 * hr, 1.0, 250))
      .toDF("arm", "t", "e")
    val r = Survival.rmstAdjusted(subjects, Seq("arm"), "t", "e",
      profiles = Seq("ctrl" -> Seq(0.0), "treat" -> Seq(1.0)),
      horizon = tau, ties = "breslow")
      .collect().map(x => x.getAs[String]("profile") -> x).toMap
    def truth(lam: Double) = (1 - math.exp(-lam * tau)) / (1 - math.exp(-lam))
    Seq("ctrl" -> lam0, "treat" -> lam0 * hr).foreach { case (p, lam) =>
      val row = r(p)
      val (lo, hi) = (row.getAs[Double]("ci_lo"), row.getAs[Double]("ci_hi"))
      assert(row.getAs[Double]("se") > 0)
      assert(lo < truth(lam) && truth(lam) < hi,
        s"$p: CI [$lo, $hi] must cover ${truth(lam)}")
      assert(hi - lo < 8.0, s"$p CI absurdly wide: [$lo, $hi]")
      assert(math.abs((lo + hi) / 2 - row.getAs[Double]("rmst")) < 1e-9)
    }
    assert(r("ctrl").getAs[Double]("rmst") > r("treat").getAs[Double]("rmst"),
      "higher hazard must lose event-free time")
  }

  test("rmstAdjusted: a horizon before the first event gives rmst = horizon, se = 0") {
    val subjects = Seq((0.0, 5L, 1), (1.0, 6L, 1), (0.0, 7L, 0), (1.0, 8L, 0),
      (0.0, 9L, 1), (1.0, 9L, 0)).toDF("arm", "t", "e")
    val rows = Survival.rmstAdjusted(subjects, Seq("arm"), "t", "e",
      profiles = Seq("ctrl" -> Seq(0.0), "treat" -> Seq(1.0)),
      horizon = 3L, ties = "breslow").collect()
    assert(rows.length == 2)
    rows.foreach { row =>
      assert(row.getAs[Double]("rmst") == 3.0 && row.getAs[Double]("se") == 0.0 &&
        row.getAs[Double]("ci_lo") == 3.0 && row.getAs[Double]("ci_hi") == 3.0,
        row.toString)
    }
  }

  test("rmstDiffAdjusted: covers the true contrast; covariance makes it tighter than the naive sum") {
    val rnd = new scala.util.Random(5)
    val lam0 = 0.02; val hr = 1.6; val tau = 60L
    def draw(lam: Double, arm: Double, n: Int) = (1 to n).map { _ =>
      val d = math.ceil(-math.log(rnd.nextDouble()) / lam).toLong
      (arm, math.min(d, tau), if (d <= tau) 1 else 0)
    }
    val subjects = (draw(lam0, 0.0, 250) ++ draw(lam0 * hr, 1.0, 250))
      .toDF("arm", "t", "e")
    val d = Survival.rmstDiffAdjusted(subjects, Seq("arm"), "t", "e",
      focalProfile = Seq(1.0), refProfile = Seq(0.0),
      horizon = tau, ties = "breslow").head
    def truth(lam: Double) = (1 - math.exp(-lam * tau)) / (1 - math.exp(-lam))
    val trueDiff = truth(lam0 * hr) - truth(lam0)
    assert(d.getAs[Double]("diff") < 0, "higher hazard loses event-free time")
    assert(d.getAs[Double]("ci_lo") < trueDiff && trueDiff < d.getAs[Double]("ci_hi"),
      s"CI [${d.getAs[Double]("ci_lo")}, ${d.getAs[Double]("ci_hi")}] must cover $trueDiff")
    // the per-arm rows' diff matches; the contrast SE is strictly tighter
    // than root-sum-squaring them (shared baseline noise cancels)
    val per = Survival.rmstAdjusted(subjects, Seq("arm"), "t", "e",
      profiles = Seq("ctrl" -> Seq(0.0), "treat" -> Seq(1.0)),
      horizon = tau, ties = "breslow")
      .collect().map(r => r.getAs[String]("profile") -> r).toMap
    val naive = math.sqrt(
      math.pow(per("treat").getAs[Double]("se"), 2) +
        math.pow(per("ctrl").getAs[Double]("se"), 2))
    assert(math.abs(d.getAs[Double]("diff") -
      (per("treat").getAs[Double]("rmst") - per("ctrl").getAs[Double]("rmst"))) < 1e-12)
    assert(d.getAs[Double]("se") < naive,
      s"contrast se ${d.getAs[Double]("se")} must be tighter than naive $naive")
    assert(intercept[IllegalArgumentException](
      Survival.rmstDiffAdjusted(subjects, Seq("arm"), "t", "e",
        Seq(1.0), Seq(1.0), tau)).getMessage.contains("differ"))
  }

  test("coxSurvivalBands: bands cover the true exponential-PH survival; degenerate checks") {
    val rnd = new scala.util.Random(5)
    val lam0 = 0.02; val hr = 1.6; val tau = 60L
    def draw(lam: Double, arm: Double, n: Int) = (1 to n).map { _ =>
      val d = math.ceil(-math.log(rnd.nextDouble()) / lam).toLong
      (arm, math.min(d, tau), if (d <= tau) 1 else 0)
    }
    val subjects = (draw(lam0, 0.0, 250) ++ draw(lam0 * hr, 1.0, 250))
      .toDF("arm", "t", "e")
    val rows = Survival.coxSurvivalBands(subjects, Seq("arm"), "t", "e",
      profiles = Seq("ctrl" -> Seq(0.0), "treat" -> Seq(1.0)), ties = "breslow")
      .collect()
    assert(rows.nonEmpty)
    def sTrue(lam: Double, t: Long) = math.exp(-lam * t)
    var covered = 0
    var total = 0
    rows.foreach { r =>
      val t = r.getAs[Long]("t")
      val lam = if (r.getAs[String]("profile") == "treat") lam0 * hr else lam0
      val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo > 0 && hi <= 1.0 + 1e-12 && lo <= r.getAs[Double]("survival") &&
        r.getAs[Double]("survival") <= hi, r.toString)
      assert(r.getAs[Double]("se") >= 0)
      if (t < tau) { // at the censor horizon the step curve is biased by design
        total += 1
        if (lo <= sTrue(lam, t) && sTrue(lam, t) <= hi) covered += 1
      }
    }
    // pointwise 95% bands: on ~110 grid points expect >= 85% coverage
    assert(covered.toDouble / total > 0.85,
      s"bands covered only $covered/$total true points")
    // the ctrl profile's beta term must still be nonzero (xbar != 0) and
    // the point estimates must match coxSurvival exactly
    val point = Survival.coxSurvival(subjects, Seq("arm"), "t", "e",
      profiles = Seq("ctrl" -> Seq(0.0), "treat" -> Seq(1.0)), ties = "breslow")
      .collect().map(r => (r.getAs[Long]("t"), r.getAs[String]("profile")) ->
        r.getAs[Double]("survival")).toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("t"), r.getAs[String]("profile"))
      assert(math.abs(r.getAs[Double]("survival") - point(k)) < 1e-12)
    }
  }
}
