package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Funnel
import graft.streaming.EventStreams
import graft.streaming.EventStreams.FunnelEvent

/** Streaming funnel ([[EventStreams.streamingFunnel]]): incremental
  * per-user state equals the batch fold under in-order delivery, and the
  * documented divergence (cross-batch regression ignored) holds. */
class FunnelStreamSpec extends SparkSuite {
  import spark.implicits._

  private val stages = Seq("a", "b", "c")

  private def finalStates(batches: Seq[Seq[FunnelEvent]]): Map[Long, (Int, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[FunnelEvent]
    val q = EventStreams.streamingFunnel(spark, ms.toDS(), stages)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_t").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // last emitted update per user is the final state
      spark.table("funnel_t")
        .groupBy("user_id")
        .agg(max(struct(col("reached"), col("first_us"), col("last_us"))).as("m"))
        .select("user_id", "m.reached", "m.first_us", "m.last_us")
        .as[(Long, Int, Long, Long)].collect()
        .map { case (u, r, f, l) => u -> ((r, f, l)) }.toMap
    } finally q.stop()
  }

  private def batchStates(evs: Seq[FunnelEvent]): Map[Long, (Int, Long, Long)] =
    Funnel.userProgress(
      evs.map(e => (e.user_id, new Timestamp(e.us / 1000), e.event_type))
        .toDF("user_id", "ts", "event_type"),
      "user_id", "event_type", "ts", stages)
      .select("user", "reached", "first_us", "last_us")
      .as[(Long, Int, Option[Long], Option[Long])].collect()
      .map { case (u, r, f, l) =>
        u -> ((r, f.getOrElse(Long.MinValue), l.getOrElse(Long.MinValue)))
      }.toMap

  test("in-order delivery across micro-batches equals the batch fold") {
    val b1 = Seq(
      FunnelEvent(1, 1000000L, "a"), FunnelEvent(1, 2000000L, "x"),
      FunnelEvent(2, 1000000L, "b"))
    val b2 = Seq(
      FunnelEvent(1, 3000000L, "b"), FunnelEvent(2, 4000000L, "a"),
      FunnelEvent(1, 5000000L, "c"))
    val got = finalStates(Seq(b1, b2))
    val want = batchStates(b1 ++ b2)
    assert(got(1L) == want(1L)) // (3, 1000000, 5000000)
    assert(got(1L)._1 == 3)
    assert(got(2L) == want(2L)) // b-before-a: only 'a' counted
    assert(got(2L)._1 == 1)
  }

  test("within-batch disorder is repaired by the per-batch sort") {
    val got = finalStates(Seq(Seq(
      FunnelEvent(1, 5000000L, "c"), FunnelEvent(1, 1000000L, "a"),
      FunnelEvent(1, 3000000L, "b"))))
    assert(got(1L)._1 == 3)
  }

  test("cross-batch regression is ignored (documented divergence)") {
    // 'b' arrives in a later batch with an EARLIER timestamp than the 'a'
    // that advanced the funnel — strict > rejects it; batch mode on the
    // union would also reject it (b at 1s is not after a at 2s), so state
    // matches batch here too. True divergence needs b BETWEEN a and a
    // later already-consumed c: stream ignores it, batch accepts.
    val b1 = Seq(FunnelEvent(1, 2000000L, "a"), FunnelEvent(1, 6000000L, "b"),
      FunnelEvent(1, 8000000L, "c"))
    val b2 = Seq(FunnelEvent(1, 4000000L, "b"))
    val got = finalStates(Seq(b1, b2))
    assert(got(1L)._1 == 3)
    // batch over the union reaches b at 4s then c at 8s — same depth,
    // different b-time; the stream kept its in-order answer (b at 6s)
    val want = batchStates(b1 ++ b2)
    assert(want(1L)._1 == 3)
    assert(got(1L)._3 == want(1L)._3) // same final reach time (c at 8s)
  }

  test("state is three numbers per user (no event buffering): many events, one row") {
    val evs = (1 to 500).map(i => FunnelEvent(7, i * 1000000L, "x")) :+
      FunnelEvent(7, 501000000L, "a")
    val got = finalStates(Seq(evs))
    assert(got(7L)._1 == 1)
  }
}
