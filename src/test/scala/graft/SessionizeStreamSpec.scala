package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Sessionize
import graft.streaming.EventStreams
import graft.streaming.EventStreams.SessionEvent

/** Streaming sessionize ([[EventStreams.streamingSessionize]]): the
  * incremental per-key (last_ts, counter) state assigns the SAME
  * session_id per event as the batch two-window construction under
  * in-order delivery across micro-batches — including a session spanning
  * the batch boundary and a gap splitting at it — and the documented
  * late-event divergence (joins the current session) holds. */
class SessionizeStreamSpec extends SparkSuite {
  import spark.implicits._

  private val GapUs = 1000000L // 1s

  private def streamed(batches: Seq[Seq[SessionEvent]]): Map[(Long, Long), Long] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SessionEvent]
    val q = EventStreams.streamingSessionize(spark, ms.toDS(), GapUs)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_t").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      spark.table("sess_t")
        .select("user_id", "event_id", "session_id")
        .as[(Long, Long, Long)].collect()
        .map { case (u, e, s) => (u, e) -> s }.toMap
    } finally q.stop()
  }

  private def batch(evs: Seq[SessionEvent]): Map[(Long, Long), Long] =
    Sessionize.assignSessions(
      evs.map(e => (e.user_id, new Timestamp(e.us / 1000), e.event_id))
        .toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id", GapUs)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect()
      .map { case (u, e, s) => (u, e) -> s }.toMap

  test("in-order delivery across micro-batches equals the batch windows") {
    // user 1: session 1 = events 10,11 (binding across the batch break),
    //         session 2 = events 12,13 (gap inside batch 2)
    // user 2: session 1 = event 20; session 2 = event 21 (gap AT the break)
    val b1 = Seq(
      SessionEvent(1, 1000000L, 10), SessionEvent(2, 1000000L, 20))
    val b2 = Seq(
      SessionEvent(1, 1800000L, 11), // 0.8s after 10: same session
      SessionEvent(2, 9000000L, 21), // 8s after 20: new session
      SessionEvent(1, 4000000L, 12), // 2.2s after 11: new session
      SessionEvent(1, 4500000L, 13)) // 0.5s after 12: same session
    val got = streamed(Seq(b1, b2))
    val want = batch(b1 ++ b2)
    assert(got == want, s"streamed=$got batch=$want")
    assert(got((1L, 10L)) == 1L && got((1L, 11L)) == 1L)
    assert(got((1L, 12L)) == 2L && got((1L, 13L)) == 2L)
    assert(got((2L, 20L)) == 1L && got((2L, 21L)) == 2L)
  }

  test("ties at the same timestamp break on event_id, matching the batch op") {
    val b = Seq(
      SessionEvent(3, 5000000L, 31), SessionEvent(3, 5000000L, 30),
      SessionEvent(3, 7000000L, 32))
    assert(streamed(Seq(b)) == batch(b))
  }

  test("documented divergence: a late cross-batch event joins the current session") {
    val b1 = Seq(SessionEvent(4, 10000000L, 40))
    // arrives AFTER event 40 was seen, but timestamped long before it:
    // gap vs max-seen (10s) is > 1s in the past => |us - last| computed as
    // negative delta, <= gap, so it joins session 1 in the stream…
    val b2 = Seq(SessionEvent(4, 1000000L, 41))
    val got = streamed(Seq(b1, b2))
    assert(got((4L, 41L)) == 1L)
    // …while the batch op, seeing full history in order, numbers it as
    // the FIRST session and event 40 as the second
    val want = batch(b1 ++ b2)
    assert(want((4L, 41L)) == 1L && want((4L, 40L)) == 2L)
    assert(got((4L, 40L)) == 1L, "stream assigned before the late arrival")
  }
}
