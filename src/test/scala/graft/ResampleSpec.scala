package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Resample

/** Fixed-grid resampling ([[graft.ops.Resample]]): grid bounds, in-bucket
  * argmax, forward fill, and linear interpolation pinned on hand-built
  * gaps — independent of the q170/q171 DuckDB oracles. */
class ResampleSpec extends SparkSuite {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def fixture = {
    import spark.implicits._
    Seq(
      // key A: observations in buckets 0 and 3 (step=10s) → interior gap
      ("A", ts(1), 10.0, 1L),
      ("A", ts(35), 40.0, 2L),
      // bucket 0 has a second, LATER observation that must win
      ("A", ts(5), 12.0, 3L),
      // key B: single observation → single-row grid, nothing filled
      ("B", ts(100), 7.0, 4L))
      .toDF("k", "t", "v", "id")
  }

  test("ffill: per-key grid spans [first,last], argmax per bucket, gaps carry last value") {
    val out = Resample.ffill(fixture, "k", "t", "v", step = 10L, tieBreak = "id")
      .orderBy("k", "bucket_ts").collect()
    val a = out.filter(_.getString(0) == "A")
    assert(a.length == 4, a.mkString(","))
    // bucket 0: later ts(5) observation (12.0) wins over ts(1)
    assert(a.map(_.getDouble(2)).toSeq == Seq(12.0, 12.0, 12.0, 40.0))
    assert(a.map(_.getBoolean(3)).toSeq == Seq(false, true, true, false))
    val b = out.filter(_.getString(0) == "B")
    assert(b.length == 1 && b.head.getDouble(2) == 7.0 && !b.head.getBoolean(3))
  }

  test("interpolate: interior gaps take the straight line, observed rows unchanged") {
    val out = Resample.interpolate(fixture, "k", "t", "v", step = 10L, tieBreak = "id")
      .orderBy("k", "bucket_ts").collect()
    val a = out.filter(_.getString(0) == "A")
    // 12 → 40 across 3 steps: 12, 12+28/3, 12+56/3, 40
    val expected = Seq(12.0, 12.0 + 28.0 / 3, 12.0 + 56.0 / 3, 40.0)
    a.map(_.getDouble(2)).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-9, s"got=$got want=$want")
    }
    assert(a.map(_.getBoolean(3)).toSeq == Seq(false, true, true, false))
  }

  test("same-timestamp ties break on the tieBreak column") {
    import spark.implicits._
    val df = Seq(
      ("A", ts(1), 1.0, 1L),
      ("A", ts(1), 2.0, 2L)) // same ts, higher id → wins
      .toDF("k", "t", "v", "id")
    val out = Resample.ffill(df, "k", "t", "v", step = 10L, tieBreak = "id").collect()
    assert(out.length == 1 && out.head.getDouble(2) == 2.0)
  }

  test("null observations are ignored, not filled from") {
    import spark.implicits._
    val df = Seq(
      ("A", ts(1), Some(5.0), 1L),
      ("A", ts(15), None, 2L), // null in bucket 1: NOT an observation
      ("A", ts(25), Some(9.0), 3L))
      .toDF("k", "t", "v", "id")
    val out = Resample.ffill(df, "k", "t", "v", step = 10L, tieBreak = "id")
      .orderBy("bucket_ts").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(5.0, 5.0, 9.0))
    assert(out.map(_.getBoolean(3)).toSeq == Seq(false, true, false))
  }
}
