package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Sessionize

/** Property check: [[Sessionize.assignSessions]] equals the sequential
  * per-user reference fold on arbitrary event streams — boundary gaps
  * (exactly the gap does NOT split; gap+1 does), duplicate timestamps
  * broken by the tie column, and multiple interleaved users. */
object SessionizeProps extends Properties("Sessionize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSession.spark

  private val GapUs = 10L * 1000000L // 10 s

  private val event: Gen[(Long, Long, Long)] =
    for {
      u <- Gen.chooseNum(1L, 3L)
      // microsecond offsets clustered so gaps land on BOTH sides of GapUs
      t <- Gen.oneOf(
        Gen.chooseNum(0L, 5L).map(_ * 1000000L), // dense
        Gen.chooseNum(0L, 4L).map(i => i * GapUs), // exact-boundary multiples
        Gen.chooseNum(0L, 3L).map(i => i * (GapUs + 1L))) // just-over gaps
      id <- Gen.chooseNum(0L, 99L)
    } yield (u, t, id)

  private def reference(evs: Seq[(Long, Long, Long)]): Map[(Long, Long, Long), Long] =
    evs.groupBy(_._1).flatMap { case (_, rows) =>
      var sess = 0L
      var last = Long.MinValue
      rows.sortBy(r => (r._2, r._3)).map { r =>
        if (sess == 0L || r._2 - last > GapUs) sess += 1
        last = r._2
        r -> sess
      }
    }

  property("equals the sequential fold; exact-gap holds, gap+1 splits") =
    forAll(Gen.nonEmptyListOf(event).map(_.distinct.take(40))) { evs =>
      import spark.implicits._
      val df = evs.map { case (u, t, id) => (u, new Timestamp(t / 1000L), t, id) }
        .toDF("user_id", "ts_wrong", "us", "event_id")
        .selectExpr("user_id", "timestamp_micros(us) AS ts", "us", "event_id")
      val got = Sessionize.assignSessions(df, "user_id", "ts", "event_id", GapUs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)) -> r.getLong(4))
        .toMap
      got == reference(evs)
    }
}
