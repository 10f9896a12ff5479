package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.streaming.EventStreams

/** [[EventStreams.startExperimentScorecardSink]] — the continuous
  * experiment readout must equal the batch transform on the same rows,
  * land exactly-once in the versioned table under forced foreachBatch
  * replay, and carry the dead-letter/one-armed semantics. */
@org.scalatest.tags.Slow
class ScorecardSinkSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  // window 10:00 balanced with a real lift; window 11:00 heavily skewed
  // assignment (SRM must fire); one undeclared arm row in window 10
  private val rows: Seq[(Timestamp, String, Int)] =
    (1 to 100).map(i => (t(f"2024-01-01 10:00:${i % 60}%02d"), "treat",
      if (i <= 40) 1 else 0)) ++
      (1 to 100).map(i => (t(f"2024-01-01 10:01:${i % 60}%02d"), "ctrl",
        if (i <= 25) 1 else 0)) ++
      Seq((t("2024-01-01 10:02:03"), "mystery", 1)) ++
      (1 to 190).map(i => (t(f"2024-01-01 11:00:${i % 60}%02d"), "treat", i % 3 min 1)) ++
      (1 to 10).map(i => (t(f"2024-01-01 11:01:${i % 60}%02d"), "ctrl", i % 2))

  test("streaming scorecard == batch transform; exactly-once under forced replay") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_ck").toString
    val ms = MemoryStream[(Timestamp, String, Int)]
    val q = EventStreams.startExperimentScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv"), "arm", "conv", "ts",
      focal = "treat", control = "ctrl", focalShare = 0.5,
      tablePath = path, writerId = "scorecard-spec", checkpointDir = ckpt,
      windowLen = "1 hour", watermark = "10 minutes")
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      // a far-future sentinel advances the watermark past both windows
      ms.addData((t("2024-01-02 09:00:00"), "treat", 0))
      q.processAllAvailable()
      val got = VersionedTable.table(spark, path).orderBy("w_start").collect()
      assert(got.length == 2, s"two closed windows expected, got ${got.length}")
      val batchDf = EventStreams.experimentScorecard(
        rows.toDF("ts", "arm", "conv"), "arm", "conv", "ts",
        "treat", "ctrl", 0.5, "1 hour", "10 minutes")
      val batch = batchDf.orderBy("w_start").collect()
      // the sink table carries the always-valid columns ON TOP of the
      // batch transform's — project to the shared schema for equality
      val gotProj = VersionedTable.table(spark, path)
        .select(batchDf.columns.map(col).toSeq: _*).orderBy("w_start").collect()
      gotProj.zip(batch).foreach { case (s, b) =>
        assert(s.toSeq == b.toSeq, s"stream row $s != batch row $b")
      }
      val Array(w10, w11) = got
      // hand numbers: 100/100, 40 vs 25 conversions, one dead-letter
      assert(w10.getAs[Long]("n_f") == 100 && w10.getAs[Long]("n_c") == 100)
      assert(w10.getAs[Long]("undeclared_n") == 1)
      assert(math.abs(w10.getAs[Double]("lift") - 0.15) < 1e-12)
      assert(w10.getAs[Boolean]("srm"), "the dead-letter row must force the alarm")
      // 190 vs 10 on a declared 50/50: chi2 = 2*90^2/100 = 162 → alarm
      assert(math.abs(w11.getAs[Double]("srm_chi2") - 162.0) < 1e-9)
      assert(w11.getAs[Boolean]("srm"))
      assert(w11.getAs[Double]("p_srm") < 1e-9)

      // forced replay of an already-committed batch is absorbed by the
      // (writerId, batchId) txn gate — the table does not grow
      val before = VersionedTable.table(spark, path).count()
      val replay = EventStreams.experimentScorecard(
        rows.toDF("ts", "arm", "conv"), "arm", "conv", "ts",
        "treat", "ctrl", 0.5, "1 hour", "10 minutes")
      // batchIds 0..n were consumed by the query; replaying ANY of them is a no-op
      (0L to 2L).foreach { bid =>
        VersionedTable.commitStreamBatch(replay, path, "scorecard-spec", bid)
      }
      assert(VersionedTable.table(spark, path).count() == before,
        "replayed batches must be absorbed, not re-applied")
    } finally q.stop()
  }

  test("a window missing an arm lands with null lift but real counts; refusals at declaration") {
    implicit val sqlCtx = spark.sqlContext
    val oneArm = ((1 to 30).map(i => (t(f"2024-01-01 10:00:${i % 60}%02d"), "treat", i % 2)))
      .toDF("ts", "arm", "conv")
    val r = EventStreams.experimentScorecard(
      oneArm, "arm", "conv", "ts", "treat", "ctrl", 0.5, "1 hour", "10 minutes")
      .collect()(0)
    assert(r.getAs[Long]("n_f") == 30 && r.getAs[Long]("n_c") == 0)
    assert(r.isNullAt(r.fieldIndex("lift")) && r.isNullAt(r.fieldIndex("se")))
    // all-one-arm IS the worst ratio mismatch: chi2 = n, alarm on
    assert(math.abs(r.getAs[Double]("srm_chi2") - 30.0) < 1e-9)
    assert(r.getAs[Boolean]("srm"))
    assert(intercept[IllegalArgumentException](
      EventStreams.experimentScorecard(oneArm, "arm", "conv", "ts",
        "treat", "treat", 0.5, "1 hour", "10 minutes"))
      .getMessage.contains("differ"))
    assert(intercept[IllegalArgumentException](
      EventStreams.experimentScorecard(oneArm, "arm", "conv", "ts",
        "treat", "ctrl", 1.0, "1 hour", "10 minutes"))
      .getMessage.contains("focalShare"))
  }

  test("CUPED-adjusted scorecard: streaming window row equals batch Cuped.cuped to 1e-12") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard_cuped")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_cuped_ck").toString
    // one event per subject; pre-period activity predicts conversion
    val rnd = new scala.util.Random(13)
    val subjects: Seq[(Timestamp, String, Int, Long)] = (1 to 240).map { i =>
      val armName = if (i % 2 == 0) "treat" else "ctrl"
      val pre = i % 9
      val conv = if (rnd.nextDouble() < 0.1 + 0.06 * pre + (if (armName == "treat") 0.08 else 0.0)) 1 else 0
      val w = if (i <= 120) "10" else "11"
      (t(s"2024-01-01 $w:00:${f"${i % 60}%02d"}"), armName, conv, i.toLong)
    }
    val dim = subjects.map { case (_, _, _, uid) => (uid, (uid % 9).toDouble) }
      .toDF("uid", "pre_x")
    val ms = MemoryStream[(Timestamp, String, Int, Long)]
    val q = EventStreams.startExperimentScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv", "uid"), "arm", "conv", "ts",
      focal = "treat", control = "ctrl", focalShare = 0.5,
      tablePath = path, writerId = "scorecard-cuped-spec", checkpointDir = ckpt,
      windowLen = "1 hour", watermark = "10 minutes",
      preCovariate = Some((dim, "uid", "pre_x")))
    try {
      ms.addData(subjects: _*)
      q.processAllAvailable()
      ms.addData((t("2024-01-02 09:00:00"), "treat", 0, 999999L))
      q.processAllAvailable()
      val got = VersionedTable.table(spark, path).orderBy("w_start").collect()
      assert(got.length == 2, s"two closed windows expected, got ${got.length}")
      got.foreach { row =>
        val ws = row.getAs[Timestamp]("w_start")
        val winSubjects = subjects.filter { case (ts0, _, _, _) =>
          ts0.getTime >= ws.getTime && ts0.getTime < ws.getTime + 3600000L
        }.map { case (_, a, c, uid) => (a, c.toDouble, (uid % 9).toDouble) }
          .toDF("arm", "y", "x")
        val b = graft.ops.Cuped.cuped(winSubjects, "arm", "y", "x", focal = "treat").head
        assert(row.getAs[Long]("n_f") == b.getAs[Long]("n_a"))
        assert(math.abs(row.getAs[Double]("theta") - b.getAs[Double]("theta")) < 1e-12)
        assert(math.abs(row.getAs[Double]("lift") - b.getAs[Double]("delta_raw")) < 1e-12)
        assert(math.abs(row.getAs[Double]("lift_cuped") - b.getAs[Double]("delta_cuped")) < 1e-12)
        assert(math.abs(row.getAs[Double]("se_cuped") - b.getAs[Double]("se_cuped")) < 1e-12)
        assert(math.abs(row.getAs[Double]("var_reduction") - b.getAs[Double]("var_reduction")) < 1e-12)
        assert(row.getAs[Double]("var_reduction") > 0.0,
          "a predictive pre-period covariate must remove variance")
      }
      // streaming == the batch transform with the same dim, on the
      // transform's columns (the sink adds the always-valid ones on top)
      val batchDf = EventStreams.experimentScorecard(
        subjects.toDF("ts", "arm", "conv", "uid"), "arm", "conv", "ts",
        "treat", "ctrl", 0.5, "1 hour", "10 minutes",
        preCovariate = Some((dim, "uid", "pre_x")))
      val batch = batchDf.orderBy("w_start").collect()
      val gotProj = VersionedTable.table(spark, path)
        .select(batchDf.columns.map(col).toSeq: _*).orderBy("w_start").collect()
      gotProj.zip(batch).foreach { case (sr, br) =>
        assert(sr.toSeq == br.toSeq, s"stream row $sr != batch row $br")
      }
    } finally q.stop()
  }

  test("always-valid p: streaming fold == batch SequentialTest on every prefix; replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard_av")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_av_ck").toString
    val ms = MemoryStream[(Timestamp, String, Int)]
    val q = EventStreams.startExperimentScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv"), "arm", "conv", "ts",
      focal = "treat", control = "ctrl", focalShare = 0.5,
      tablePath = path, writerId = "scorecard-av-spec", checkpointDir = ckpt,
      windowLen = "1 hour", watermark = "10 minutes")
    val w10 = (1 to 80).map(i => (t(f"2024-01-01 10:00:${i % 60}%02d"), "treat",
      if (i <= 40) 1 else 0)) ++
      (1 to 80).map(i => (t(f"2024-01-01 10:01:${i % 60}%02d"), "ctrl",
        if (i <= 20) 1 else 0))
    val closer10 = (t("2024-01-01 11:30:00"), "treat", 0) // joins window 11
    val w11 = (1 to 60).map(i => (t(f"2024-01-01 11:05:${i % 60}%02d"),
      if (i % 2 == 0) "treat" else "ctrl", i % 3 min 1))
    val closer11 = (t("2024-01-01 12:40:00"), "treat", 0)
    try {
      // three separate commits: w10 closes in a DIFFERENT foreachBatch
      // than w11, so the prior-cumulative state crosses commits
      ms.addData(w10 ++ w11: _*)
      q.processAllAvailable()
      ms.addData(closer10)
      q.processAllAvailable() // closes window 10
      ms.addData(closer11)
      q.processAllAvailable() // closes window 11 (incl. closer10's row)
      val got = VersionedTable.table(spark, path).orderBy("w_start").collect()
      assert(got.length == 2, s"expected 2 closed windows, got ${got.length}")
      // batch comparator: cumulative counts per window prefix ->
      // SequentialTest.alwaysValidP on the same monitor grid
      val allRows = w10 ++ w11 :+ closer10 :+ closer11
      val windows = EventStreams.experimentScorecard(
        allRows.toDF("ts", "arm", "conv"), "arm", "conv", "ts",
        "treat", "ctrl", 0.5, "1 hour", "10 minutes")
        .orderBy("w_start").collect().take(2)
      val cums = windows.scanLeft((0L, 0L, 0L, 0L)) { (acc, r) =>
        (acc._1 + r.getAs[Long]("n_f"), acc._2 + r.getAs[Long]("conv_f"),
          acc._3 + r.getAs[Long]("n_c"), acc._4 + r.getAs[Long]("conv_c"))
      }.tail
      val monitor = windows.zip(cums).map { case (r, (nf, cf, nc, cc)) =>
        (r.getAs[Timestamp]("w_start"), nf, cf, nc, cc)
      }.toSeq.toDF("day", "n_a", "conv_a", "n_b", "conv_b")
      val expected = graft.ops.SequentialTest.alwaysValidP(monitor)
        .orderBy("day").collect()
      got.zip(expected).zip(cums).foreach { case ((s, e), (nf, cf, nc, cc)) =>
        assert(s.getAs[Long]("cum_n_f") == nf && s.getAs[Long]("cum_conv_f") == cf)
        assert(s.getAs[Long]("cum_n_c") == nc && s.getAs[Long]("cum_conv_c") == cc)
        assert(s.getAs[Double]("log_lambda") == e.getAs[Double]("log_lambda"),
          s"log_lambda: stream ${s.getAs[Double]("log_lambda")} != batch ${e.getAs[Double]("log_lambda")}")
        assert(s.getAs[Double]("p_always_valid") == e.getAs[Double]("p_always_valid"),
          s"p_av: stream ${s.getAs[Double]("p_always_valid")} != batch ${e.getAs[Double]("p_always_valid")}")
      }
      // nonincreasing by construction across the table history
      assert(got(1).getAs[Double]("p_always_valid")
        <= got(0).getAs[Double]("p_always_valid"))
      // forced replay of a consumed batchId: the fold recomputes but the
      // txn gate absorbs the commit — table unchanged
      val before = VersionedTable.table(spark, path).collect().toSeq
      val replayBatch = EventStreams.experimentScorecard(
        allRows.toDF("ts", "arm", "conv"), "arm", "conv", "ts",
        "treat", "ctrl", 0.5, "1 hour", "10 minutes").limit(1)
      (0L to 2L).foreach { bid =>
        VersionedTable.commitStreamBatch(
          EventStreams.alwaysValidFold(replayBatch, path, 0.1),
          path, "scorecard-av-spec", bid)
      }
      assert(VersionedTable.table(spark, path).collect().toSeq == before,
        "replayed batches must be absorbed, not re-applied")
    } finally q.stop()
  }

  test("CUPED always-valid leg: cumulative fold == batch Cuped.cuped + mean-mSPRT on every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard_avc")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_avc_ck").toString
    val rnd = new scala.util.Random(29)
    // three hourly windows; pre-period activity predicts conversion
    val subjects: Seq[(Timestamp, String, Int, Long)] = (1 to 360).map { i =>
      val armName = if (i % 2 == 0) "treat" else "ctrl"
      val pre = i % 9
      val conv = if (rnd.nextDouble() < 0.08 + 0.05 * pre +
        (if (armName == "treat") 0.1 else 0.0)) 1 else 0
      val w = 10 + (i - 1) / 120
      (t(f"2024-01-01 $w%02d:00:${i % 60}%02d"), armName, conv, i.toLong)
    }
    val dim = subjects.map { case (_, _, _, uid) => (uid, (uid % 9).toDouble) }
      .toDF("uid", "pre_x")
    val ms = MemoryStream[(Timestamp, String, Int, Long)]
    val tau = 0.1
    val q = EventStreams.startExperimentScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv", "ts_uid").withColumnRenamed("ts_uid", "uid"),
      "arm", "conv", "ts",
      focal = "treat", control = "ctrl", focalShare = 0.5,
      tablePath = path, writerId = "scorecard-avc-spec", checkpointDir = ckpt,
      windowLen = "1 hour", watermark = "10 minutes",
      preCovariate = Some((dim, "uid", "pre_x")), alwaysValidTau = tau)
    try {
      // windows close in SEPARATE commits so the cumulative moment state
      // crosses the table boundary, not just the batch window function
      ms.addData(subjects.filter(_._1.getTime < t("2024-01-01 11:00:00").getTime): _*)
      q.processAllAvailable()
      ms.addData(subjects.filter(_._1.getTime >= t("2024-01-01 11:00:00").getTime): _*)
      q.processAllAvailable()
      ms.addData((t("2024-01-01 13:30:00"), "treat", 0, 999999L))
      q.processAllAvailable()
      val got = VersionedTable.table(spark, path).orderBy("w_start").collect()
      assert(got.length == 3, s"three closed windows expected, got ${got.length}")
      var runMax = Double.NegativeInfinity
      got.zipWithIndex.foreach { case (row, k) =>
        val we = row.getAs[Timestamp]("w_end").getTime
        val prefix = subjects.filter(_._1.getTime < we)
          .map { case (_, a, c, uid) => (a, c.toDouble, (uid % 9).toDouble) }
          .toDF("arm", "y", "x")
        val b = graft.ops.Cuped.cuped(prefix, "arm", "y", "x", focal = "treat").head
        assert(math.abs(row.getAs[Double]("theta_cum") - b.getAs[Double]("theta")) < 1e-12,
          s"window $k theta_cum")
        assert(math.abs(row.getAs[Double]("lift_cuped_cum") - b.getAs[Double]("delta_cuped")) < 1e-12)
        assert(math.abs(row.getAs[Double]("se_cuped_cum") - b.getAs[Double]("se_cuped")) < 1e-12)
        // the mean-mSPRT on (delta_cuped, se_cuped²) — alwaysValidPMean's
        // arithmetic replayed here as the independent comparator
        val d = b.getAs[Double]("delta_cuped")
        val v = math.pow(b.getAs[Double]("se_cuped"), 2)
        val t2 = tau * tau
        val lnl = 0.5 * math.log(v / (v + t2)) + d * d * t2 / (2.0 * v * (v + t2))
        assert(math.abs(row.getAs[Double]("log_lambda_cuped") - lnl) < 1e-12,
          s"window $k lnl: got ${row.getAs[Double]("log_lambda_cuped")}, expected $lnl")
        runMax = math.max(runMax, lnl)
        val expectP = math.min(1.0, math.exp(-runMax))
        assert(math.abs(row.getAs[Double]("p_always_valid_cuped") - expectP) < 1e-12)
      }
      // the adjusted monitor must dominate the raw one on this fixture
      // (the covariate removes real variance, so evidence accrues faster)
      val lastRow = got.last
      assert(lastRow.getAs[Double]("p_always_valid_cuped")
        <= lastRow.getAs[Double]("p_always_valid") + 1e-12,
        s"cuped p ${lastRow.getAs[Double]("p_always_valid_cuped")} vs raw ${lastRow.getAs[Double]("p_always_valid")}")
      // nonincreasing across the table history
      val ps = got.map(_.getAs[Double]("p_always_valid_cuped"))
      assert(ps.sliding(2).forall(w => w(1) <= w(0) + 1e-15), ps.mkString(","))
    } finally q.stop()
  }

  test("CUPED scorecard: a window with a thin arm lands null adjusted columns, raw intact") {
    val thin = (1 to 30).map(i => (t(f"2024-01-01 10:00:${i % 60}%02d"),
      if (i == 1) "ctrl" else "treat", i % 2, i.toLong))
      .toDF("ts", "arm", "conv", "uid")
    val dim = (1 to 30).map(i => (i.toLong, (i % 5).toDouble)).toDF("uid", "pre_x")
    val r = EventStreams.experimentScorecard(
      thin, "arm", "conv", "ts", "treat", "ctrl", 0.5, "1 hour", "10 minutes",
      preCovariate = Some((dim, "uid", "pre_x"))).collect()(0)
    assert(r.getAs[Long]("n_c") == 1 && r.getAs[Long]("n_f") == 29)
    assert(!r.isNullAt(r.fieldIndex("lift")), "raw lift exists with 1 subject")
    Seq("theta", "lift_cuped", "se_cuped", "z_cuped", "var_reduction").foreach(c =>
      assert(r.isNullAt(r.fieldIndex(c)), s"$c must be null on a <2-subject arm"))
  }

  test("clustered scorecard: robust SEs equal batch Cuped clustered to 1e-12; mixed clusters null them") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard_cl")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_cl_ck").toString
    val rnd = new scala.util.Random(31)
    // cluster-randomized: arm is a function of the GEO cluster
    val subjects: Seq[(Timestamp, String, Int, Long, String)] = (1 to 300).map { i =>
      val geo = i % 25
      val armName = if (geo % 2 == 0) "treat" else "ctrl"
      val pre = geo % 7
      val conv = if (rnd.nextDouble() < 0.1 + 0.05 * pre + (if (armName == "treat") 0.1 else 0.0)) 1 else 0
      (t(f"2024-01-01 10:00:${i % 60}%02d"), armName, conv, i.toLong, s"g$geo")
    }
    val dim = subjects.map { case (_, _, _, uid, geo) =>
      (uid, (geo.drop(1).toInt % 7).toDouble)
    }.distinct.toDF("uid", "pre_x")
    val ms = MemoryStream[(Timestamp, String, Int, Long, String)]
    val q = EventStreams.startExperimentScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv", "uid", "geo"), "arm", "conv", "ts",
      focal = "treat", control = "ctrl", focalShare = 0.5,
      tablePath = path, writerId = "scorecard-cl-spec", checkpointDir = ckpt,
      windowLen = "1 hour", watermark = "10 minutes",
      preCovariate = Some((dim, "uid", "pre_x")),
      clusterCol = Some("geo"))
    try {
      ms.addData(subjects: _*)
      q.processAllAvailable()
      ms.addData((t("2024-01-02 09:00:00"), "treat", 0, 999999L, "g0"))
      q.processAllAvailable()
      val got = VersionedTable.table(spark, path).orderBy("w_start").collect()
      assert(got.length == 1)
      val row = got(0)
      assert(row.getAs[Long]("mixed_cluster_n") == 0L)
      assert(row.getAs[Long]("m_f") == 13L && row.getAs[Long]("m_c") == 12L)
      val b = graft.ops.Cuped.cuped(
        subjects.map { case (_, a, c, _, geo) =>
          (a, c.toDouble, (geo.drop(1).toInt % 7).toDouble, geo)
        }.toDF("arm", "y", "x", "geo"),
        "arm", "y", "x", focal = "treat", clusterCol = Some("geo")).head
      assert(row.getAs[Long]("n_f") == b.getAs[Long]("n_a"))
      Seq("theta" -> "theta", "lift_cuped" -> "delta_cuped",
        "se_cuped" -> "se_cuped", "var_reduction" -> "var_reduction",
        "robust_se_raw" -> "robust_se_raw",
        "robust_se_cuped" -> "robust_se_cuped").foreach { case (sc, bc) =>
        assert(math.abs(row.getAs[Double](sc) - b.getAs[Double](bc)) < 1e-12,
          s"$sc: stream ${row.getAs[Double](sc)} != batch ${b.getAs[Double](bc)}")
      }
      // duplicated clusters invariance carries over: the robust SE came
      // from cluster sums, so it must differ from the iid one here
      assert(row.getAs[Double]("robust_se_raw") != row.getAs[Double]("se"))
    } finally q.stop()
  }

  test("clustered always-valid leg: streaming fold == batch clusterMeanMonitor on every prefix; ledger replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard_clav")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_clav_ck").toString
    val tau = 0.1
    // three hourly windows; geos g0..g5, arm a function of the geo —
    // except g5, which flips arms in hour 12 (a cross-WINDOW assignment
    // defect only the cumulative ledger can see: within each window g5
    // is pure)
    def armOf(geo: Int, hour: Int): String =
      if (geo == 5) (if (hour >= 12) "treat" else "ctrl")
      else if (geo % 2 == 0) "treat" else "ctrl"
    val rows: Seq[(Timestamp, String, Int, String)] = for {
      hour <- Seq(10, 11, 12)
      geo <- 0 to 5
      i <- 1 to 10
    } yield (t(f"2024-01-01 $hour%02d:00:${(geo * 10 + i) % 60}%02d"),
      armOf(geo, hour), (i + geo * 2 + hour) % 3 min 1, s"g$geo")
    val ms = MemoryStream[(Timestamp, String, Int, String)]
    val q = EventStreams.startExperimentScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv", "geo"), "arm", "conv", "ts",
      focal = "treat", control = "ctrl", focalShare = 0.5,
      tablePath = path, writerId = "scorecard-clav-spec", checkpointDir = ckpt,
      windowLen = "1 hour", watermark = "10 minutes",
      clusterCol = Some("geo"), alwaysValidTau = tau)
    try {
      // feed hour-by-hour so windows close across SEPARATE micro-batches
      // (the ledger must carry cluster sums between commits)
      rows.groupBy(_._1.toLocalDateTime.getHour).toSeq.sortBy(_._1)
        .foreach { case (_, hr) => ms.addData(hr: _*); q.processAllAvailable() }
      ms.addData((t("2024-01-02 09:00:00"), "treat", 0, "g0"))
      q.processAllAvailable()
      val got = VersionedTable.table(spark, path).orderBy("w_start").collect()
      assert(got.length == 3, s"three closed windows, got ${got.length}")
      // batch monitor on the same subjects, day = the window start
      val subj = rows.toDF("ts", "arm", "conv", "geo")
        .withColumn("day", date_trunc("hour", col("ts")))
      val looks = subj.select("day").distinct()
      val monitor = graft.ops.SequentialTest.clusterMeanMonitor(
        subj, "arm", "day", "conv", "geo", looks, "day",
        focal = "treat", control = "ctrl", minClusters = 2L)
      val batch = graft.ops.SequentialTest.alwaysValidPMean(monitor, tau)
        .collect().map(r => r.getAs[Timestamp]("day") -> r).toMap
      assert(batch.nonEmpty, "batch monitor must qualify at least one look")
      got.foreach { s =>
        val ws = s.getAs[Timestamp]("w_start")
        batch.get(ws).foreach { b =>
          assert(s.getAs[Long]("cum_m_f") == b.getAs[Long]("n_a"))
          assert(s.getAs[Long]("cum_m_c") == b.getAs[Long]("n_b"))
          assert(s.getAs[Long]("cum_mixed_cluster_n") == b.getAs[Long]("mixed_m"))
          assert(math.abs(s.getAs[Double]("log_lambda_cluster") -
            b.getAs[Double]("log_lambda")) < 1e-12,
            s"lnl at $ws: ${s.getAs[Double]("log_lambda_cluster")} vs " +
              s"${b.getAs[Double]("log_lambda")}")
          assert(math.abs(s.getAs[Double]("p_always_valid_cluster") -
            b.getAs[Double]("p_always_valid")) < 1e-12,
            s"p at $ws")
        }
      }
      // the cross-window flip makes g5 cumulatively mixed from hour 12 on
      val byW = got.map(r => r.getAs[Timestamp]("w_start").toLocalDateTime.getHour ->
        r.getAs[Long]("cum_mixed_cluster_n")).toMap
      assert(byW(10) == 0L && byW(11) == 0L && byW(12) == 1L,
        s"g5 must turn mixed exactly at hour 12, got $byW")
      // p is nonincreasing across the table history
      got.map(_.getAs[Double]("p_always_valid_cluster")).toSeq.sliding(2)
        .foreach { case Seq(a, b) => assert(b <= a + 1e-15); case _ => () }
      // the cluster ledger holds one cumulative row per cluster
      val ledger = VersionedTable.table(spark, s"${path}_clusters")
        .orderBy("cluster").collect()
      assert(ledger.length == 6, s"6 clusters expected, got ${ledger.length}")
      val g5 = ledger.find(_.getAs[String]("cluster") == "g5").get
      assert(g5.getAs[Long]("n_f") > 0 && g5.getAs[Long]("n_c") > 0,
        "the flipped cluster's ledger row must show both sides")
      // forced replay: recommitting consumed batch ids must not grow the
      // scorecard or regress the ledger
      val tblBefore = VersionedTable.table(spark, path).count()
      val ledBefore = ledger.map(_.toSeq).toSeq
      (0L to 3L).foreach { bid =>
        VersionedTable.commitStreamBatch(
          VersionedTable.table(spark, path).limit(0), path,
          "scorecard-clav-spec", bid)
        VersionedTable.commitOverwriteBatch(
          VersionedTable.table(spark, s"${path}_clusters").limit(0),
          s"${path}_clusters", "scorecard-clav-spec", bid)
      }
      assert(VersionedTable.table(spark, path).count() == tblBefore)
      assert(VersionedTable.table(spark, s"${path}_clusters")
        .orderBy("cluster").collect().map(_.toSeq).toSeq == ledBefore,
        "a replayed ledger overwrite must be absorbed by the txn gate")
    } finally q.stop()
  }

  test("clustered CUPED always-valid leg: streaming == batch clusterMeanMonitor(xCol) + alwaysValidPMeanCuped") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard_clavc")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_clavc_ck").toString
    val tau = 0.1
    def armOf(geo: Int): String = if (geo % 2 == 0) "treat" else "ctrl"
    def xOf(geo: Int, i: Int): Double = ((geo * 3 + i) % 5).toDouble
    val rows: Seq[(Timestamp, String, Int, Long, String)] = for {
      hour <- Seq(10, 11, 12)
      geo <- 0 to 5
      i <- 1 to 10
    } yield (t(f"2024-01-01 $hour%02d:00:${(geo * 10 + i) % 60}%02d"),
      armOf(geo), (i + geo * 2 + hour) % 3 min 1,
      (hour * 1000 + geo * 100 + i).toLong, s"g$geo")
    val dim = rows.map { case (_, _, _, uid, geo) =>
      (uid, xOf(geo.drop(1).toInt, (uid % 100).toInt % 10))
    }.distinct.toDF("uid", "pre_x")
    val ms = MemoryStream[(Timestamp, String, Int, Long, String)]
    val q = EventStreams.startExperimentScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv", "uid", "geo"), "arm", "conv", "ts",
      focal = "treat", control = "ctrl", focalShare = 0.5,
      tablePath = path, writerId = "scorecard-clavc-spec", checkpointDir = ckpt,
      windowLen = "1 hour", watermark = "10 minutes",
      preCovariate = Some((dim, "uid", "pre_x")),
      clusterCol = Some("geo"), alwaysValidTau = tau)
    try {
      rows.groupBy(_._1.toLocalDateTime.getHour).toSeq.sortBy(_._1)
        .foreach { case (_, hr) => ms.addData(hr: _*); q.processAllAvailable() }
      ms.addData((t("2024-01-02 09:00:00"), "treat", 0, 999999L, "g0"))
      q.processAllAvailable()
      val got = VersionedTable.table(spark, path).orderBy("w_start").collect()
      assert(got.length == 3)
      // batch: same subjects with x resolved the same way
      val subj = rows.map { case (ts, a, c, uid, geo) =>
        (ts, a, c, geo, xOf(geo.drop(1).toInt, (uid % 100).toInt % 10))
      }.toDF("ts", "arm", "conv", "geo", "x")
        .withColumn("day", date_trunc("hour", col("ts")))
      val looks = subj.select("day").distinct()
      val monitor = graft.ops.SequentialTest.clusterMeanMonitor(
        subj, "arm", "day", "conv", "geo", looks, "day",
        focal = "treat", control = "ctrl", minClusters = 2L, xCol = Some("x"))
      val batch = graft.ops.SequentialTest.alwaysValidPMeanCuped(monitor, tau)
        .collect().map(r => r.getAs[Timestamp]("day") -> r).toMap
      assert(batch.nonEmpty)
      var compared = 0
      got.foreach { s =>
        batch.get(s.getAs[Timestamp]("w_start")).foreach { b =>
          compared += 1
          assert(math.abs(s.getAs[Double]("theta_cluster") -
            b.getAs[Double]("theta")) < 1e-12)
          assert(math.abs(s.getAs[Double]("delta_cluster_cuped") -
            b.getAs[Double]("delta_cuped")) < 1e-12)
          assert(math.abs(s.getAs[Double]("log_lambda_cluster_cuped") -
            b.getAs[Double]("log_lambda_cuped")) < 1e-12)
          assert(math.abs(s.getAs[Double]("p_always_valid_cluster_cuped") -
            b.getAs[Double]("p_always_valid_cuped")) < 1e-12)
        }
      }
      assert(compared >= 2, s"must compare several windows, got $compared")
      // the raw cluster leg still rides beside the adjusted one
      got.foreach { s =>
        assert(!s.isNullAt(s.fieldIndex("p_always_valid_cluster")))
      }
      // ledger now carries the covariate sums per cluster
      val led = VersionedTable.table(spark, s"${path}_clusters")
      assert(led.columns.contains("sx_f") && led.columns.contains("sx_c"))
    } finally q.stop()
  }

  test("multi-arm scorecard: streaming == MultiArm.sequential on every window prefix; arm ledger + SRM") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard_abn")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_abn_ck").toString
    val tau = 0.1
    val abnRows: Seq[(Timestamp, String, Int, Long)] = for {
      hour <- Seq(10, 11, 12)
      i <- 1 to 40
    } yield {
      val uid = ((i + hour * 7) % 24).toLong
      (t(f"2024-01-01 $hour%02d:00:${i % 60}%02d"), s"a${uid % 4}",
        (i + hour + uid.toInt) % 3 min 1, uid)
    }
    val dim = abnRows.map(r => (r._4, (r._4 % 5).toDouble)).distinct
      .toDF("uid", "pre_x")
    val ms = MemoryStream[(Timestamp, String, Int, Long)]
    val q = EventStreams.startMultiArmScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv", "uid"), "arm", "conv", "ts",
      control = "a0", tablePath = path, writerId = "scorecard-abn-spec",
      checkpointDir = ckpt, windowLen = "1 hour", watermark = "10 minutes",
      tau = tau, minPerArm = 2L,
      preCovariate = Some((dim, "uid", "pre_x")),
      expectedShares = Some(Map(
        "a0" -> 0.25, "a1" -> 0.25, "a2" -> 0.25, "a3" -> 0.25)))
    try {
      abnRows.groupBy(_._1.toLocalDateTime.getHour).toSeq.sortBy(_._1)
        .foreach { case (_, hr) => ms.addData(hr: _*); q.processAllAvailable() }
      ms.addData((t("2024-01-02 09:00:00"), "a0", 0, 999L))
      q.processAllAvailable()
      val got = VersionedTable.table(spark, path).orderBy("w_start", "arm")
        .collect()
      assert(got.nonEmpty)
      // batch twin: same subjects with day = the event's hour window —
      // shared contrast/BH code, so equality is the cross-batch
      // fold (ledger moments + prior max + k offset) under test
      val subj = abnRows.map { case (ts, a, c, uid) =>
        (ts, a, c.toDouble, (uid % 5).toDouble)
      }.toDF("ts", "arm", "v", "x")
        .withColumn("day", date_trunc("hour", col("ts")))
      val looks = subj.select("day").distinct()
      val batch = graft.ops.MultiArm.sequential(
        subj, "arm", "day", "v", looks, "day", control = "a0", tau = tau,
        minPerArm = 2L, xCol = Some("x"))
        .collect()
        .map(r => (r.getAs[Timestamp]("day"), r.getAs[String]("arm")) -> r)
        .toMap
      assert(batch.nonEmpty)
      var compared = 0
      got.foreach { s =>
        batch.get((s.getAs[Timestamp]("w_start"), s.getAs[String]("arm")))
          .foreach { b =>
            compared += 1
            assert(s.getAs[Long]("k") == b.getAs[Long]("k"))
            assert(s.getAs[Long]("n") == b.getAs[Long]("n"))
            Seq("mean", "delta", "log_lambda", "p_always_valid", "theta",
              "delta_cuped", "se_cuped", "log_lambda_cuped",
              "p_always_valid_cuped", "q_bh").foreach { cn =>
              assert(math.abs(s.getAs[Double](cn) - b.getAs[Double](cn)) < 1e-12,
                s"$cn @ ${s.getAs[Timestamp]("w_start")} ${s.getAs[String]("arm")}")
            }
            assert(s.getAs[Long]("m") == b.getAs[Long]("m"))
            assert(s.getAs[Long]("rk") == b.getAs[Long]("rk"))
            assert(s.getAs[Boolean]("discovery") == b.getAs[Boolean]("discovery"))
          }
      }
      assert(compared == got.length && compared == batch.size,
        s"row sets must match: streaming ${got.length}, batch ${batch.size}, compared $compared")
      // balanced fixture: SRM present and quiet; no dead letters
      got.foreach { s =>
        assert(s.getAs[Long]("null_arm_n") == 0L)
        val p = s.getAs[Double]("p_srm")
        assert(p >= 0.0 && p <= 1.0)
        assert(!s.getAs[Boolean]("srm"))
      }
      // the arm ledger is arm-sized and carries the cumulative census
      // (the sentinel's window never closed, so it never reached the sink)
      val led = VersionedTable.table(spark, s"${path}_arms").collect()
      assert(led.map(_.getAs[String]("arm")).sorted.toSeq ==
        Seq("a0", "a1", "a2", "a3"))
      assert(led.map(_.getAs[Long]("n")).sum == abnRows.length.toLong)
      // forced replay of consumed batchIds: the fold recomputes against
      // the CURRENT ledgers (deterministic), and both txn gates absorb —
      // neither the scorecard nor the arm ledger moves
      val before = VersionedTable.table(spark, path).count()
      val ledBefore = led.map(_.toSeq).toSet
      val replayBatch = EventStreams.multiArmPerArm(
        abnRows.toDF("ts", "arm", "conv", "uid"), "arm", "conv", "ts",
        "1 hour", "10 minutes", Some((dim, "uid", "pre_x")))
      val (replayOut, replayLed) = EventStreams.multiArmFold(
        replayBatch, path, "a0", tau, 0.05, 2L, None)
      (0L to 3L).foreach { bid =>
        VersionedTable.commitStreamBatch(
          replayOut, path, "scorecard-abn-spec", bid)
        replayLed.foreach(l => VersionedTable.commitOverwriteBatch(
          l, s"${path}_arms", "scorecard-abn-spec", bid))
      }
      assert(VersionedTable.table(spark, path).count() == before,
        "replayed batches must be absorbed, not re-applied")
      assert(VersionedTable.table(spark, s"${path}_arms").collect()
        .map(_.toSeq).toSet == ledBefore,
        "a replayed ledger overwrite must be absorbed by the txn gate")
    } finally q.stop()
  }

  test("clustered multi-arm scorecard: streaming == MultiArm.sequentialClustered incl. cross-batch invasion") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("scorecard_abn_cl")
    val ckpt = java.nio.file.Files.createTempDirectory("scorecard_abn_cl_ck").toString
    val tau = 0.1
    val baseRows: Seq[(Timestamp, String, Int, Long, String)] = for {
      hour <- Seq(10, 11, 12)
      geo <- 0 until 12
      i <- 1 to 6
    } yield (t(f"2024-01-01 $hour%02d:00:${(geo * 6 + i) % 60}%02d"),
      s"a${geo % 4}", (i + hour + geo) % 3 min 1, (geo * 10 + i).toLong,
      s"g$geo")
    // geo g1 (own arm a1 from hour 10) is invaded by a2 in hour 12 —
    // the invasion CROSSES micro-batches relative to g1's first touch
    val invasion = (1 to 3).map(i =>
      (t(f"2024-01-01 12:00:${40 + i}%02d"), "a2", 1, (990 + i).toLong, "g1"))
    val allRows = baseRows ++ invasion
    val dim = allRows.map(r => (r._4, (r._4 % 5).toDouble)).distinct
      .toDF("uid", "pre_x")
    val ms = MemoryStream[(Timestamp, String, Int, Long, String)]
    val q = EventStreams.startMultiArmScorecardSink(
      ms.toDF().toDF("ts", "arm", "conv", "uid", "geo"), "arm", "conv", "ts",
      control = "a0", tablePath = path, writerId = "scorecard-abn-cl-spec",
      checkpointDir = ckpt, windowLen = "1 hour", watermark = "10 minutes",
      tau = tau, minPerArm = 2L,
      preCovariate = Some((dim, "uid", "pre_x")),
      clusterCol = Some("geo"))
    try {
      allRows.groupBy(_._1.toLocalDateTime.getHour).toSeq.sortBy(_._1)
        .foreach { case (_, hr) => ms.addData(hr: _*); q.processAllAvailable() }
      ms.addData((t("2024-01-02 09:00:00"), "a0", 0, 1L, "g0"))
      q.processAllAvailable()
      val got = VersionedTable.table(spark, path).orderBy("w_start", "arm")
        .collect()
      assert(got.nonEmpty)
      val subj = allRows.map { case (ts, a, c, uid, geo) =>
        (ts, a, c.toDouble, (uid % 5).toDouble, geo)
      }.toDF("ts", "arm", "v", "x", "geo")
        .withColumn("day", date_trunc("hour", col("ts")))
      val looks = subj.select("day").distinct()
      val batch = graft.ops.MultiArm.sequentialClustered(
        subj, "arm", "day", "v", "geo", looks, "day", control = "a0",
        tau = tau, minClusters = 2L, xCol = Some("x"))
        .collect()
        .map(r => (r.getAs[Timestamp]("day"), r.getAs[String]("arm")) -> r)
        .toMap
      assert(batch.nonEmpty)
      var compared = 0
      got.foreach { s =>
        batch.get((s.getAs[Timestamp]("w_start"), s.getAs[String]("arm")))
          .foreach { b =>
            compared += 1
            assert(s.getAs[Long]("k") == b.getAs[Long]("k"))
            assert(s.getAs[Long]("n") == b.getAs[Long]("n"))
            assert(s.getAs[Long]("mixed_m") == b.getAs[Long]("mixed_m"))
            Seq("mean", "delta", "log_lambda", "p_always_valid", "theta",
              "delta_cuped", "se_cuped", "log_lambda_cuped",
              "p_always_valid_cuped", "q_bh").foreach { cn =>
              assert(math.abs(s.getAs[Double](cn) - b.getAs[Double](cn)) < 1e-12,
                s"$cn @ ${s.getAs[Timestamp]("w_start")} ${s.getAs[String]("arm")}")
            }
            assert(s.getAs[Long]("m") == b.getAs[Long]("m"))
            assert(s.getAs[Long]("rk") == b.getAs[Long]("rk"))
            assert(s.getAs[Boolean]("discovery") == b.getAs[Boolean]("discovery"))
          }
      }
      assert(compared == got.length && compared == batch.size,
        s"row sets must match: streaming ${got.length}, batch ${batch.size}")
      // the invasion shows exactly where it happened
      got.foreach { s =>
        val h = s.getAs[Timestamp]("w_start").toLocalDateTime.getHour
        assert(s.getAs[Long]("mixed_m") == (if (h == 12) 1L else 0L),
          s"mixed_m at hour $h")
      }
      // ledgers: 12 pure pairs + the invading (g1, a2); 4 arms
      val cl = VersionedTable.table(spark, s"${path}_clusters").collect()
      assert(cl.length == 13)
      assert(cl.count(r => r.getAs[String]("cluster") == "g1") == 2)
      val arms = VersionedTable.table(spark, s"${path}_arms").collect()
      assert(arms.map(_.getAs[String]("arm")).sorted.toSeq ==
        Seq("a0", "a1", "a2", "a3"))
      // forced replay of consumed batchIds through ALL THREE gates
      // (scorecard append + cluster-ledger overwrite + arm-ledger
      // overwrite): absorbed, nothing moves
      val before = VersionedTable.table(spark, path).count()
      val clBefore = cl.map(_.toSeq).toSet
      val armsBefore = arms.map(_.toSeq).toSet
      val replayBatch = EventStreams.multiArmPerCluster(
        allRows.toDF("ts", "arm", "conv", "uid", "geo"), "arm", "conv",
        "ts", "geo", "1 hour", "10 minutes", Some((dim, "uid", "pre_x")))
      val (rOut, rCl, rArms) = EventStreams.multiArmClusterFold(
        replayBatch, path, "a0", tau, 0.05, 2L, None)
      (0L to 3L).foreach { bid =>
        VersionedTable.commitStreamBatch(
          rOut, path, "scorecard-abn-cl-spec", bid)
        rCl.foreach(l => VersionedTable.commitOverwriteBatch(
          l, s"${path}_clusters", "scorecard-abn-cl-spec", bid))
        rArms.foreach(l => VersionedTable.commitOverwriteBatch(
          l, s"${path}_arms", "scorecard-abn-cl-spec", bid))
      }
      assert(VersionedTable.table(spark, path).count() == before)
      assert(VersionedTable.table(spark, s"${path}_clusters").collect()
        .map(_.toSeq).toSet == clBefore)
      assert(VersionedTable.table(spark, s"${path}_arms").collect()
        .map(_.toSeq).toSet == armsBefore)
    } finally q.stop()
  }

  test("multi-arm fold: segmentation-grade arm column and dead letters") {
    import spark.implicits._
    val many = (0 until 70).map(i =>
      (t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), s"a$i",
        5L, 2.0, 1.0)).toDF("w_start", "w_end", "arm", "en", "sv", "svv")
    val e = intercept[IllegalArgumentException](
      EventStreams.multiArmFold(many, fresh("abn_refuse"), "a0",
        0.1, 0.05, 2L, None))
    assert(e.getMessage.contains("segmentation"), e.getMessage)
    // null arms are counted per window, not inferred over
    val withNull = Seq(
      (t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), "a0", 5L, 2.0, 1.0),
      (t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), "a1", 5L, 3.0, 2.0),
      (t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), null.asInstanceOf[String], 7L, 1.0, 1.0))
      .toDF("w_start", "w_end", "arm", "en", "sv", "svv")
    val (out, ledger) = EventStreams.multiArmFold(withNull,
      fresh("abn_null"), "a0", 0.1, 0.05, 2L, None)
    val rowsOut = out.collect()
    assert(rowsOut.length == 1)
    assert(rowsOut.head.getAs[Long]("null_arm_n") == 7L)
    assert(rowsOut.head.getAs[String]("arm") == "a1")
    assert(ledger.isDefined)
    assert(ledger.get.collect().map(_.getAs[String]("arm")).sorted.toSeq ==
      Seq("a0", "a1"))
  }

  test("clustered scorecard: a both-arm cluster nulls the robust columns and is counted") {
    val mixed = (1 to 40).map { i =>
      // cluster g0 deliberately receives BOTH arms
      val geo = if (i <= 4) "g0" else s"g${i % 10}"
      val armName = if (i <= 2 || (i > 4 && (i % 10) % 2 == 0)) "treat" else "ctrl"
      (t(f"2024-01-01 10:00:${i % 60}%02d"), armName, i % 2, i.toLong, geo)
    }.toDF("ts", "arm", "conv", "uid", "geo")
    val r = EventStreams.experimentScorecard(
      mixed, "arm", "conv", "ts", "treat", "ctrl", 0.5, "1 hour", "10 minutes",
      clusterCol = Some("geo")).collect()(0)
    assert(r.getAs[Long]("mixed_cluster_n") >= 1L)
    assert(r.isNullAt(r.fieldIndex("robust_se_raw")),
      "a mixed cluster must null the robust readout")
    assert(!r.isNullAt(r.fieldIndex("lift")), "the iid readout survives")
  }
}
