package graft

import java.sql.Timestamp

import graft.ops.MarkovAttribution
import graft.ops.MarkovAttribution.{Conv, Null, Start}

/** [[MarkovAttribution]] — hand-computed transition counts (journey
  * restart after conversion, null tails) and hand-solved removal
  * effects on a two-channel chain. */
class MarkovAttributionSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, t, e) => (u, new Timestamp(t), t, e) }
      .toDF("user_id", "ts", "event_id", "event_type")

  private def counts(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    MarkovAttribution
      .transitionCounts(df, "user_id", "ts", "event_id", "event_type", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("transition counts: journeys restart after conversion; tails hit (null)") {
    val df = ev(
      (1L, 1L, "A"), (1L, 2L, "purchase"), (1L, 3L, "B"), // restart: B ends null
      (2L, 1L, "A"))                                       // lone touch ends null
    assert(counts(df) == Map(
      (Start, "A") -> 2L, ("A", Conv) -> 1L, ("A", Null) -> 1L,
      (Start, "B") -> 1L, ("B", Null) -> 1L))
  }

  test("removal effects match the hand-solved two-channel chain") {
    // start->A (4): A->conv 3, A->null 1 ; start->B (4): B->conv 1, B->null 3
    // P(conv) = .5*.75 + .5*.25 = .5 ; remove A -> .125 (RE .75); remove B -> .375 (RE .25)
    val rows =
      (1L to 3L).flatMap(u => Seq((u, 1L, "A"), (u, 2L, "purchase"))) ++
        Seq((4L, 1L, "A")) ++
        Seq((5L, 1L, "B"), (5L, 2L, "purchase")) ++
        (6L to 8L).map(u => (u, 1L, "B"))
    val df = ev(rows: _*)
    val trans = MarkovAttribution
      .transitionCounts(df, "user_id", "ts", "event_id", "event_type", "purchase")
    val got = MarkovAttribution.attribute(spark, trans)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(got("A")._1 - 0.75) < 1e-12, got.toString)
    assert(math.abs(got("B")._1 - 0.25) < 1e-12, got.toString)
    assert(math.abs(got("A")._2 - 0.75) < 1e-12 && math.abs(got("B")._2 - 0.25) < 1e-12)
  }

  test("removal redirect merges with an existing (s, null) edge instead of dropping it") {
    // A has BOTH an (A, B) edge and an (A, (null)) edge: removing B
    // redirects (A, B) onto the existing (A, (null)) key — a Map.map
    // remap would last-write-wins one of the two counts.
    // Journeys: u1 A->purchase; u2 A->B->purchase; u3 A (null tail).
    // Base chain: A->conv 1/3, A->B 1/3 (B->conv 1), A->null 1/3 => 2/3.
    // Remove B (merged A->null = 2): conv 1/3 => RE_B = 1 - (1/3)/(2/3) = 0.5
    // (the collision bug yields A->null 1, conv prob 1/2, RE_B 0.25).
    // Remove A: start->null only => RE_A = 1. Shares 2/3, 1/3.
    val df = ev(
      (1L, 1L, "A"), (1L, 2L, "purchase"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "purchase"),
      (3L, 1L, "A"))
    val trans = MarkovAttribution
      .transitionCounts(df, "user_id", "ts", "event_id", "event_type", "purchase")
    val got = MarkovAttribution.attribute(spark, trans)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(got("B")._1 - 0.5) < 1e-12, got.toString)
    assert(math.abs(got("A")._1 - 1.0) < 1e-12, got.toString)
    assert(math.abs(got("A")._2 - 2.0 / 3) < 1e-12 && math.abs(got("B")._2 - 1.0 / 3) < 1e-12)
  }

  test("attribute refuses a data-sized state column (maxStates cap)") {
    val rows = (1L to 40L).flatMap(u => Seq((u, 1L, s"url_$u"), (u, 2L, "purchase")))
    val trans = MarkovAttribution
      .transitionCounts(ev(rows: _*), "user_id", "ts", "event_id", "event_type", "purchase")
    val e = intercept[IllegalArgumentException] {
      MarkovAttribution.attribute(spark, trans, maxStates = 10)
    }
    assert(e.getMessage.contains("exceeds maxStates=10"))
    // a genuinely bounded vocabulary passes with a raised cap
    assert(MarkovAttribution.attribute(spark, trans, maxStates = 64).count() == 40)
  }

  test("shares normalize to 1 on the fixture corpus; deterministic across layouts") {
    val events = graft.core.Tables.events(spark, sf0001)
    def run() = MarkovAttribution.attribute(
      spark,
      MarkovAttribution.transitionCounts(
        events, "user_id", "ts", "event_id", "event_type", "purchase"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val a = run()
    assert(math.abs(a.map(_._3).sum - 1.0) < 1e-9)
    assert(a.forall { case (_, re, sh) => re >= 0 && re <= 1 && sh >= 0 })
    assert(run() == a)
  }
}
