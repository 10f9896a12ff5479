package graft

import org.apache.spark.sql.functions._

import graft.tools.ExperimentReport

/** The `experiment-report` CLI's analysis (VERDICT r16 item 5): the
  * clustered sections must BE the underlying operators' output — the
  * report adds only the design-effect arithmetic — and the geo design
  * must actually be cluster-randomized (one arm per geo), or the
  * Liang-Zeger readout it prints would refuse. */
class ExperimentReportSpec extends SparkSuite {

  private lazy val subjects = ExperimentReport.subjects(spark, sf0001).cache()

  test("geo arm is constant within each geo cluster (cluster-randomized by construction)") {
    val bad = subjects.groupBy("geo")
      .agg(countDistinct(col("arm_geo")).as("arms"))
      .filter(col("arms") =!= 1).count()
    assert(bad == 0, s"$bad geo clusters span both arms")
    // and both arms exist at the cluster level (53 geos, hash split)
    val arms = subjects.select(countDistinct(col("arm_geo"))).head().getLong(0)
    assert(arms == 2L, s"expected 2 geo arms, got $arms")
  }

  test("section 3b == Cuped.cuped clustered output; deff = (robust_se/se)^2") {
    val direct = graft.ops.Cuped.cuped(subjects, "arm_geo", "conv",
      "activity", focal = "treat", clusterCol = Some("geo")).head()
    val report = ExperimentReport.clusteredLift(subjects).head()
    direct.schema.fieldNames.foreach { c =>
      assert(report.getAs[Any](c) == direct.getAs[Any](c),
        s"report $c=${report.getAs[Any](c)} != Cuped $c=${direct.getAs[Any](c)}")
    }
    def sq(x: Double) = x * x
    assert(report.getAs[Double]("deff_raw") ==
      sq(direct.getAs[Double]("robust_se_raw")) / sq(direct.getAs[Double]("se_raw")))
    assert(report.getAs[Double]("deff_cuped") ==
      sq(direct.getAs[Double]("robust_se_cuped")) / sq(direct.getAs[Double]("se_cuped")))
    // the design effect is a real number on this fixture, not a NaN
    // artifact of a degenerate arm
    assert(report.getAs[Double]("deff_raw") > 0.0)
  }

  test("section 2b == PowerAnalysis.mdeTwoSampleClustered on the geo grid") {
    val direct = graft.ops.PowerAnalysis.mdeTwoSampleClustered(
      subjects, "activity", "geo").head()
    val report = ExperimentReport.clusteredDesign(subjects).head()
    assert(report.toSeq == direct.toSeq)
    // m is the fixture's actual geo count (sf0.001 has fewer users than
    // the 53 hash buckets — the report must count clusters, not buckets)
    val geos = subjects.select(countDistinct(col("geo"))).head().getLong(0)
    assert(report.getAs[Long]("m") == geos, s"m=${report.getAs[Long]("m")} geos=$geos")
  }

  test("CUPED covariate is strictly pre-entry activity") {
    // recompute entry + pre-entry counts independently and diff
    val ev = graft.core.Tables.events(spark, sf0001).select(
      col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val entry = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("entry_us"))
    val pre = ev.join(entry, "user_id").filter(col("us") < col("entry_us"))
      .groupBy("user_id").agg(count(lit(1)).cast("double").as("expect"))
    val diff = subjects.join(pre, Seq("user_id"), "left")
      .filter(col("activity") =!= coalesce(col("expect"), lit(0.0))).count()
    assert(diff == 0, s"$diff subjects carry post-entry activity")
  }

  test("section 4 == meanMonitor + alwaysValidPMean; 4b == clusterMeanMonitor (by the day grid)") {
    val looks = subjects.select(col("entry_day").as("day")).distinct()
    val directIid = graft.ops.SequentialTest.alwaysValidPMean(
      graft.ops.SequentialTest.meanMonitor(
        subjects, "arm", "entry_day", "conv", looks, "day", focal = "treat",
        minPerArm = ExperimentReport.sequentialMinPerArm),
      ExperimentReport.sequentialTau)
      .select("day", "k", "log_lambda", "p_always_valid").collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r).toMap
    val got = ExperimentReport.sequentialLift(subjects).collect()
    assert(got.nonEmpty, "the fixture must qualify at least one look")
    assert(got.length == directIid.size)
    got.foreach { r =>
      val d = directIid(r.getAs[java.sql.Date]("day"))
      assert(r.getAs[Long]("k") == d.getAs[Long]("k"))
      assert(r.getAs[Double]("log_lambda") == d.getAs[Double]("log_lambda"))
      assert(r.getAs[Double]("p_always_valid") == d.getAs[Double]("p_always_valid"))
    }
    val directCl = graft.ops.SequentialTest.alwaysValidPMean(
      graft.ops.SequentialTest.clusterMeanMonitor(
        subjects, "arm_geo", "entry_day", "conv", "geo", looks, "day",
        focal = "treat", control = "ctrl"),
      ExperimentReport.sequentialTau)
      .select("day", "n_a", "n_b", "p_always_valid").collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r).toMap
    val gotCl = ExperimentReport.clusteredSequentialLift(subjects).collect()
    assert(gotCl.length == directCl.size)
    gotCl.foreach { r =>
      val d = directCl(r.getAs[java.sql.Date]("day"))
      // n_a/n_b here are CLUSTER counts — the honest unit
      assert(r.getAs[Long]("n_a") == d.getAs[Long]("n_a"))
      assert(r.getAs[Long]("n_b") == d.getAs[Long]("n_b"))
      assert(r.getAs[Double]("p_always_valid") == d.getAs[Double]("p_always_valid"))
    }
    // sequential p is nonincreasing — the polling contract
    got.sortBy(_.getAs[Long]("k")).map(_.getAs[Double]("p_always_valid"))
      .toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b <= a + 1e-15); case _ => ()
      }
  }

  test("section 4c == clusterMeanMonitor(xCol) + alwaysValidPMeanCuped") {
    val looks = subjects.select(col("entry_day").as("day")).distinct()
    val direct = graft.ops.SequentialTest.alwaysValidPMeanCuped(
      graft.ops.SequentialTest.clusterMeanMonitor(
        subjects, "arm_geo", "entry_day", "conv", "geo", looks, "day",
        focal = "treat", control = "ctrl", xCol = Some("activity")),
      ExperimentReport.sequentialTau)
      .select("day", "theta", "p_always_valid_cuped").collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r).toMap
    val got = ExperimentReport.clusteredSequentialLiftCuped(subjects).collect()
    assert(got.nonEmpty && got.length == direct.size)
    got.foreach { r =>
      val d = direct(r.getAs[java.sql.Date]("day"))
      assert(r.getAs[Double]("theta") == d.getAs[Double]("theta"))
      assert(r.getAs[Double]("p_always_valid_cuped") ==
        d.getAs[Double]("p_always_valid_cuped"))
    }
  }

  test("multi-arm sections 7-9b == the underlying MultiArm operators, in order") {
    val secs = ExperimentReport.multiArmSections(subjects)
    assert(secs.map(_._1.take(2)) == Seq("7.", "8.", "8b", "9.", "9b"))
    // the geo 4-arm design is cluster-randomized by construction
    val bad = subjects.groupBy("geo")
      .agg(countDistinct(col("arm4_geo")).as("a")).filter(col("a") =!= 1)
      .count()
    assert(bad == 0, s"$bad geos span multiple arm4_geo values")
    // 8 == MultiArm.report verbatim
    val got8 = secs(1)._2().collect().map(_.toSeq).toSeq
    val direct8 = graft.ops.MultiArm.report(subjects, "arm4", "conv",
      control = ExperimentReport.multiArmControl, xCol = Some("activity"))
      .collect().map(_.toSeq).toSeq
    assert(got8 == direct8 && got8.nonEmpty)
    // 8b == MultiArm.reportClustered verbatim (mixed_m 0: pure geos)
    val got8b = secs(2)._2().collect()
    val direct8b = graft.ops.MultiArm.reportClustered(subjects, "arm4_geo",
      "conv", "geo", control = ExperimentReport.multiArmControl,
      xCol = Some("activity")).collect()
    assert(got8b.map(_.toSeq).toSeq == direct8b.map(_.toSeq).toSeq)
    assert(got8b.forall(_.getAs[Long]("mixed_m") == 0L))
    // 9 == MultiArm.sequential on the (day, arm) grid
    val looks = subjects.select(col("entry_day").as("day")).distinct()
    val direct9 = graft.ops.MultiArm.sequential(
      subjects, "arm4", "entry_day", "conv", looks, "day",
      control = ExperimentReport.multiArmControl,
      tau = ExperimentReport.sequentialTau,
      minPerArm = ExperimentReport.multiArmMinPerArm,
      xCol = Some("activity"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day"), r.getAs[String]("arm")) -> r)
      .toMap
    val got9 = ExperimentReport.multiArmSequential(subjects).collect()
    assert(got9.nonEmpty && got9.length == direct9.size)
    got9.foreach { g =>
      val b = direct9((g.getAs[java.sql.Date]("day"), g.getAs[String]("arm")))
      assert(g.getAs[Double]("p_always_valid_cuped") ==
        b.getAs[Double]("p_always_valid_cuped"))
      assert(g.getAs[Double]("q_bh") == b.getAs[Double]("q_bh"))
      assert(g.getAs[Boolean]("discovery") == b.getAs[Boolean]("discovery"))
    }
    // 9b rows exist and are geo-pure on this fixture
    val got9b = ExperimentReport.multiArmSequentialClustered(subjects).collect()
    assert(got9b.nonEmpty)
    got9b.foreach(r => assert(r.getAs[Long]("mixed_m") == 0L))
  }

  test("--subjects contract: round-trips through parquet; missing columns refuse by name") {
    val dir = java.nio.file.Files.createTempDirectory("report_subjects").toString
    subjects.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // both modes accept the full frame, and the sections run on it
    ExperimentReport.requireSubjectColumns(back, arms = false)
    ExperimentReport.requireSubjectColumns(back, arms = true)
    val direct = graft.ops.MultiArm.report(subjects, "arm4", "conv",
      control = ExperimentReport.multiArmControl, xCol = Some("activity"))
      .collect().map(_.toSeq).toSeq
    val viaParquet = graft.ops.MultiArm.report(back, "arm4", "conv",
      control = ExperimentReport.multiArmControl, xCol = Some("activity"))
      .collect().map(_.toSeq).toSeq
    assert(viaParquet == direct)
    // a frame missing a mode's column refuses by name
    val e1 = intercept[IllegalArgumentException](
      ExperimentReport.requireSubjectColumns(back.drop("segment"), arms = false))
    assert(e1.getMessage.contains("segment"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      ExperimentReport.requireSubjectColumns(back.drop("arm4_geo"), arms = true))
    assert(e2.getMessage.contains("arm4_geo"), e2.getMessage)
    // dropping an arms-only column does NOT block the two-arm mode
    ExperimentReport.requireSubjectColumns(back.drop("arm4"), arms = false)
  }

  test("section list prints every design: iid 1-6 plus clustered 2b/3b/4b in order") {
    val titles = ExperimentReport.sections(subjects).map(_._1)
    assert(titles.size == 10)
    assert(titles.count(_.startsWith("2b.")) == 1)
    assert(titles.count(_.startsWith("3b.")) == 1)
    assert(titles.count(_.startsWith("4b.")) == 1)
    assert(titles.count(_.startsWith("4c.")) == 1)
    assert(titles.indexWhere(_.startsWith("2b.")) ==
      titles.indexWhere(_.startsWith("2.")) + 1)
    assert(titles.indexWhere(_.startsWith("3b.")) ==
      titles.indexWhere(_.startsWith("3.")) + 1)
    assert(titles.indexWhere(_.startsWith("4b.")) ==
      titles.indexWhere(_.startsWith("4.")) + 1)
    // the fixed-horizon lift sections are labeled as such now that the
    // always-valid sections exist — the CLI must not present a peeking
    // invitation unlabeled
    assert(titles.find(_.startsWith("3.")).get.contains("planned horizon"))
    assert(titles.find(_.startsWith("3b.")).get.contains("planned horizon"))
    assert(titles.find(_.startsWith("4.")).get.contains("always-valid"))
    // every section either produces a row or refuses BY NAME (the CLI
    // prints the diagnosis and keeps reporting — a refusal is an honest
    // answer at tiny SF, an empty frame or another exception is not)
    ExperimentReport.sections(subjects).foreach { case (t, body) =>
      try assert(body().limit(1).count() == 1L, s"section '$t' returned no row")
      catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.nonEmpty, s"section '$t' refused without a diagnosis")
      }
    }
  }
}
