package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming non-conversion detector ([[EventStreams.unmatchedWithin]]):
  * a left event emits exactly when NO right event from the same user
  * lands within the forward window — and only after the watermark closes
  * that window; matches the batch analog.
  */
class UnmatchedStreamSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("only watermark-closed non-converting clicks emit; batch analog agrees") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0), // converts at 10:20
      Ev(2, t("2024-01-01 10:00:00"), 2, "click", 2.0), // never converts
      Ev(3, t("2024-01-01 10:00:00"), 3, "click", 3.0)) // converts OUTSIDE window
    val purchases = Seq(
      Ev(10, t("2024-01-01 10:20:00"), 1, "purchase", 9.0),
      Ev(11, t("2024-01-01 11:30:00"), 3, "purchase", 9.0)) // 90m later > 30m window
    // watermark movers: advance both streams' event time far past
    // click_ts + window + watermark so the outer join finalizes
    val lateL = Ev(98, t("2024-01-01 14:00:00"), 99, "click", 0.0)
    val lateR = Ev(99, t("2024-01-01 14:00:00"), 99, "purchase", 0.0)

    val msL = MemoryStream[Ev]
    val msR = MemoryStream[Ev]
    val q = EventStreams.unmatchedWithin(msL.toDF(), msR.toDF())
      .writeStream.outputMode("append").format("memory").queryName("unm_t").start()
    try {
      msL.addData(clicks: _*); msR.addData(purchases: _*)
      q.processAllAvailable()
      msL.addData(lateL); msR.addData(lateR)
      q.processAllAvailable()
      // one more empty-ish batch so the moved watermark evicts state
      msL.addData(Ev(97, t("2024-01-01 15:00:00"), 99, "click", 0.0))
      msR.addData(Ev(96, t("2024-01-01 15:00:00"), 99, "purchase", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("unm_t").select("l_id")
        .as[Long].collect().toSet
      assert(streamed.contains(2L), "never-converting click missing")
      assert(streamed.contains(3L), "outside-window conversion should count as unmatched")
      assert(!streamed.contains(1L), "in-window conversion leaked into the unmatched feed")

      // batch analog over the full event set (no watermark gating)
      val batch = EventStreams.unmatchedWithin(
          (clicks :+ lateL).toDF(), (purchases :+ lateR).toDF())
        .select("l_id").as[Long].collect().toSet
      assert(Set(1L, 2L, 3L).intersect(batch) == Set(2L, 3L))
    } finally q.stop()
  }
}
