package graft

import org.apache.spark.sql.functions._

import graft.ml.Calibration

/** Contract of [[Calibration]]: sweep counts match hand-computed
  * confusion matrices at every cutoff in ONE pass, the reliability curve
  * recovers known calibration (ECE ≈ 0 for perfectly calibrated
  * predictions, large for inverted ones), and degenerate cutoffs report
  * zeros, not nulls.
  */
class CalibrationSpec extends SparkSuite {
  import spark.implicits._

  private def scored = Seq(
    (1.0, 0.9), (1.0, 0.8), (1.0, 0.6), (1.0, 0.4),
    (0.0, 0.7), (0.0, 0.3), (0.0, 0.2), (0.0, 0.1))
    .toDF("label", "prob")

  test("threshold sweep equals hand-computed confusion matrices, one scan") {
    val got = Calibration.thresholdSweep(scored, "label", "prob", Seq(0.5, 0.75, 0.99))
      .collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // t=0.5: predicted pos = {0.9,0.8,0.6,0.7} -> tp=3 fp=1 fn=1
    assert(got(0.5)._1 == 3L && got(0.5)._2 == 1L && got(0.5)._3 == 1L)
    assert(got(0.5)._4 == 0.75 && got(0.5)._5 == 0.75)
    // t=0.75: predicted pos = {0.9,0.8} -> tp=2 fp=0 fn=2
    assert(got(0.75)._1 == 2L && got(0.75)._2 == 0L && got(0.75)._3 == 2L)
    // t=0.99: nothing predicted positive -> precision reports 0.0, not null
    assert(got(0.99)._1 == 0L && got(0.99)._4 == 0.0)
    // one scan: a single aggregate feeds every threshold
    val plan = Calibration.thresholdSweep(scored, "label", "prob", Seq(0.3, 0.5, 0.7))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"per-threshold passes detected:\n$plan")
  }

  test("reliability: perfectly calibrated data has ECE ~ 0, inverted data does not") {
    // 100 rows per bin center, empirical positive rate == the probability
    val calibrated = (0 until 10).flatMap { b =>
      val p = b / 10.0 + 0.05
      val pos = math.round(100 * p).toInt
      Seq.fill(pos)((1.0, p)) ++ Seq.fill(100 - pos)((0.0, p))
    }.toDF("label", "prob")
    val eceCal = Calibration.ece(Calibration.reliability(calibrated, "label", "prob"))
    assert(eceCal < 0.011, s"calibrated ECE $eceCal")

    val inverted = calibrated.withColumn("prob", lit(1.0) - col("prob"))
    val eceInv = Calibration.ece(Calibration.reliability(inverted, "label", "prob"))
    assert(eceInv > 0.4, s"inverted ECE $eceInv")
  }

  test("prob = 1.0 folds into the top bin; curve is bins-sized") {
    val df = Seq((1.0, 1.0), (1.0, 0.95), (0.0, 0.0)).toDF("label", "prob")
    val curve = Calibration.reliability(df, "label", "prob", bins = 10).collect()
    assert(curve.length == 2)
    val byBin = curve.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byBin(9) == 2L && byBin(0) == 1L)
  }
}
