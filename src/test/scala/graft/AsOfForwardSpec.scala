package graft

import java.sql.Timestamp

import graft.ops.AsOf

/** Forward as-of join ([[AsOf.joinForward]]): nearest-later semantics,
  * same-instant inclusion, tie-breaking mirror rule, null for no-later,
  * key isolation — and symmetry with the backward join. */
class AsOfForwardSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000)

  private val build = Seq(
    (1L, t(10), 100L, "b10"), (1L, t(20), 200L, "b20"), (1L, t(20), 201L, "b20x"),
    (2L, t(5), 300L, "other"))
    .toDF("k", "ts", "event_id", "v")

  private def forward(probe: Seq[(Long, Long, Long)]) =
    AsOf.joinForward(
      probe.map { case (k, s, id) => (k, t(s), id) }.toDF("k", "ts", "event_id"),
      build, "k", "ts", "event_id", Seq("v"))
      .select("event_id", "asof_v").as[(Long, Option[String])]
      .collect().toMap

  test("nearest-later build row matches; probes after the last build get null") {
    val got = forward(Seq((1L, 15L, 1L), (1L, 25L, 2L), (1L, 1L, 3L)))
    assert(got(1L).contains("b20") || got(1L).contains("b20x")) // later rows only
    assert(got(2L).isEmpty)
    assert(got(3L).contains("b10"))
  }

  test("same-instant build row matches (>=)") {
    assert(forward(Seq((1L, 10L, 1L)))(1L).contains("b10"))
  }

  test("equal-time build ties resolve to the LOWEST tieBreak (mirror rule)") {
    assert(forward(Seq((1L, 15L, 1L)))(1L).contains("b20")) // 200 beats 201
  }

  test("keys are isolated") {
    assert(forward(Seq((2L, 1L, 1L)))(1L).contains("other"))
    assert(forward(Seq((2L, 6L, 1L)))(1L).isEmpty)
  }

  test("backward and forward pick the two sides of the same probe point") {
    val probe = Seq((1L, t(15), 1L)).toDF("k", "ts", "event_id")
    val back = AsOf.join(probe, build, "k", "ts", "event_id", Seq("v"))
      .select("asof_v").as[String].collect().head
    val fwd = AsOf.joinForward(probe, build, "k", "ts", "event_id", Seq("v"))
      .select("asof_v").as[String].collect().head
    assert(back == "b10" && fwd == "b20")
  }

  test("joinWithin nulls matches beyond the tolerance, keeps ones inside it") {
    // build at t=10; probes at t=12 (within 5s) and t=30 (18s stale)
    val probe = Seq((1L, t(12), 1L), (1L, t(30), 2L)).toDF("k", "ts", "event_id")
    val got = AsOf.joinWithin(
        probe, build, "k", "ts", "event_id", Seq("v"), tolerance = "5 SECONDS")
      .select("event_id", "asof_v").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("b10"))
    // t=30's nearest-earlier is b20/b20x at t=20 — 10s stale > 5s: nulled
    assert(got(2L).isEmpty)
    // forward direction mirrors: probe t=4 within 10s of t=10; t=4 with 3s is not
    val fgot = AsOf.joinWithin(
        Seq((1L, t(4), 9L)).toDF("k", "ts", "event_id"),
        build, "k", "ts", "event_id", Seq("v"),
        tolerance = "3 SECONDS", forward = true)
      .select("asof_v").as[Option[String]].collect().head
    assert(fgot.isEmpty)
  }
}
