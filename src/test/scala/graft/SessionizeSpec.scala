package graft

import java.sql.Timestamp

import graft.ops.Sessionize

/** Session-ID assignment ([[Sessionize.assignSessions]]): boundary
  * semantics (gap strictly greater splits; equal gap doesn't), first-event
  * opening, key isolation, tie determinism. */
class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def sessions(evs: Seq[(Long, Long, Long)], gapUs: Long): Map[Long, Long] =
    Sessionize.assignSessions(
      evs.map { case (u, us, id) => (u, new Timestamp(us / 1000), id) }
        .toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id", gapUs)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap

  test("gap strictly greater than the threshold opens a session; equal does not") {
    val got = sessions(Seq(
      (1L, 0L, 1L), (1L, 1000000L, 2L), // gap exactly 1s
      (1L, 2500000L, 3L)), // gap 1.5s
      gapUs = 1000000L)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 2L)
  }

  test("every key's first event opens session 1; keys are isolated") {
    val got = sessions(Seq((1L, 0L, 1L), (2L, 0L, 2L), (2L, 5000000L, 3L)), 1000000L)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 2L)
  }

  test("simultaneous events tie-break on the tie column and stay in one session") {
    val got = sessions(Seq((1L, 0L, 2L), (1L, 0L, 1L), (1L, 500000L, 3L)), 1000000L)
    assert(got.values.toSet == Set(1L))
  }
}
