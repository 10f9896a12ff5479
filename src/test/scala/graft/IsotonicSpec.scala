package graft

import org.apache.spark.sql.functions._

import graft.ml.{Calibration, Isotonic}

/** [[Isotonic]] — PAV fit: hand-checked pooling, monotonicity, exact
  * recovery of a monotone truth, and the repair contract (ECE strictly
  * improves on a miscalibrated scorer). */
class IsotonicSpec extends SparkSuite {
  import spark.implicits._

  test("hand-checked PAV pooling on a tiny violator sequence") {
    // bins 0..3 with rates 0.2, 0.6, 0.4, 0.8: bins 1 and 2 violate and
    // pool to (0.6*10 + 0.4*10)/20 = 0.5
    val rows = Seq.tabulate(4) { b =>
      val rate = Seq(0.2, 0.6, 0.4, 0.8)(b)
      (0 until 10).map(i => ((b + 0.5) / 4.0, if (i < rate * 10) 1.0 else 0.0))
    }.flatten
    val cells = Isotonic.fit(rows.toDF("score", "label"), "score", "label", bins = 4)
    assert(cells.map(c => c.bin -> c.p).toMap ==
      Map(0 -> 0.2, 1 -> 0.5, 2 -> 0.5, 3 -> 0.8))
  }

  test("fit is monotone non-decreasing and exact on monotone truth") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 20000).map { _ =>
      val s = rng.nextDouble()
      (s, if (rng.nextDouble() < s) 1.0 else 0.0) // perfectly calibrated truth
    }
    val cells = Isotonic.fit(rows.toDF("score", "label"), "score", "label", bins = 50)
    val ps = cells.sortBy(_.bin).map(_.p)
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "monotone")
    // calibrated ≈ score on calibrated data (binomial noise at n=400/bin)
    cells.foreach { c =>
      val mid = (c.bin + 0.5) / 50
      assert(math.abs(c.p - mid) < 0.12, s"bin ${c.bin}: ${c.p} vs $mid")
    }
  }

  test("repairs a miscalibrated scorer: ECE strictly improves") {
    val rng = new scala.util.Random(11)
    // true p uniform; the scorer reports sqrt(p) — systematically high
    val rows = (0 until 20000).map { _ =>
      val p = rng.nextDouble()
      (math.sqrt(p), if (rng.nextDouble() < p) 1.0 else 0.0)
    }
    val df = rows.toDF("score", "label")
    val cells = Isotonic.fit(df, "score", "label")
    val fixed = df.withColumn("cal", Isotonic.calibrate(col("score"), cells))
    val eceRaw = Calibration.ece(Calibration.reliability(df, "label", "score"))
    val eceCal = Calibration.ece(Calibration.reliability(fixed, "label", "cal"))
    assert(eceCal < eceRaw / 3, s"raw=$eceRaw calibrated=$eceCal")
    // calibrated output undoes the sqrt: cal(sqrt(p)) ≈ p at a few probes
    val probe = Seq(0.3, 0.6, 0.9).map(math.sqrt).toDF("score")
      .withColumn("cal", Isotonic.calibrate(col("score"), cells))
      .select("cal").as[Double].collect()
    probe.zip(Seq(0.3, 0.6, 0.9)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.08, s"$got vs $want")
    }
  }

  test("gap bins take the nearest occupied cell below (step extension)") {
    val df = Seq((0.1, 0.0), (0.1, 1.0), (0.9, 1.0), (0.9, 1.0))
      .toDF("score", "label")
    val cells = Isotonic.fit(df, "score", "label", bins = 10)
    val got = Seq(0.05, 0.15, 0.5, 0.95).toDF("score")
      .withColumn("cal", Isotonic.calibrate(col("score"), cells, bins = 10))
      .select("cal").as[Double].collect().toSeq
    assert(got == Seq(0.5, 0.5, 0.5, 1.0))
  }
}
