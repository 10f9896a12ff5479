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

  test("section list prints every design: iid 1-5 plus clustered 2b/3b in order") {
    val titles = ExperimentReport.sections(subjects).map(_._1)
    assert(titles.size == 7)
    assert(titles.count(_.startsWith("2b.")) == 1)
    assert(titles.count(_.startsWith("3b.")) == 1)
    assert(titles.indexWhere(_.startsWith("2b.")) ==
      titles.indexWhere(_.startsWith("2.")) + 1)
    assert(titles.indexWhere(_.startsWith("3b.")) ==
      titles.indexWhere(_.startsWith("3.")) + 1)
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
