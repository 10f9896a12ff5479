package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Anomaly

/** Volume-anomaly scoring ([[Anomaly.hourlyZScores]]): hand-computed
  * z-scores on a constructed spike, degenerate-type handling, and the
  * threshold cut. */
class AnomalySpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def eventsAt(tp: String, hourCounts: Seq[(String, Int)]) =
    hourCounts.flatMap { case (h, n) =>
      (0 until n).map(i => (tp, t(s"$h:${"%02d".format(i % 60)}:00")))
    }

  test("a spike hour scores the hand-computed z and quiet hours are cut") {
    // counts 2,2,2,10 → mu=4, sample sd=4 → spike z=1.5... use a sharper one:
    // counts 1,1,1,9 → mu=3, var=((−2)²·3+6²)/3=16, sd=4 → z_spike=1.5; still <2.
    // counts 1,1,1,1,16: mu=4, var=(9·4+144)/4=45, sd=6.708 → z=1.7889. Use minAbsZ=1.5.
    val df = eventsAt("click", Seq(
      "2024-01-01 00" -> 1, "2024-01-01 01" -> 1, "2024-01-01 02" -> 1,
      "2024-01-01 03" -> 1, "2024-01-01 04" -> 16))
      .toDF("event_type", "ts")
    val got = Anomaly.hourlyZScores(df, 1.5)
      .select("event_type", "cnt", "z").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("click", 16L, 1.7889)))
  }

  test("types with a single hour (no sample stddev) are dropped, not NaN") {
    val df = (eventsAt("steady", Seq("2024-01-01 00" -> 5)) ++
      eventsAt("spiky", Seq("2024-01-01 00" -> 1, "2024-01-01 01" -> 1, "2024-01-01 02" -> 7)))
      .toDF("event_type", "ts")
    val got = Anomaly.hourlyZScores(df, 0.0)
    assert(got.filter(col("event_type") === "steady").count() == 0)
    assert(got.filter(col("event_type") === "spiky").count() == 3)
  }

  test("constant hourly volume (zero stddev) produces no anomalies") {
    val df = eventsAt("flat", Seq("2024-01-01 00" -> 3, "2024-01-01 01" -> 3))
      .toDF("event_type", "ts")
    assert(Anomaly.hourlyZScores(df, 0.0).count() == 0)
  }
}
