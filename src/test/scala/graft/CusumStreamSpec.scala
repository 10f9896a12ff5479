package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{CusumStat, DayCount}

/** Streaming CUSUM monitor ([[EventStreams.streamingCusum]]): the
  * emitted trajectory equals the exact-integer batch fold regardless of
  * micro-batch slicing, an injected level shift raises the alarm at the
  * hand-computed window, and an in-control stream never alarms. */
class CusumStreamSpec extends SparkSuite {
  import spark.implicits._

  private def batchFold(
      counts: Seq[DayCount], refSum: Long, refN: Long,
      slack: Double, threshold: Double): Seq[CusumStat] = {
    val slackScaled = math.round(slack * refN)
    val hScaled = math.round(threshold * refN)
    var (sp, sn) = (0L, 0L)
    counts.sortBy(_.day_idx).map { e =>
      val dev = e.cnt * refN - refSum
      sp = math.max(0L, sp + dev - slackScaled)
      sn = math.max(0L, sn - dev - slackScaled)
      CusumStat(e.event_type, e.day_idx, sp, sn, sp > hScaled || sn > hScaled)
    }
  }

  private def run(
      reference: Map[String, (Long, Long)], slack: Double, threshold: Double,
      batches: Seq[Seq[DayCount]]): Seq[CusumStat] = {
    implicit val sqlCtx = spark.sqlContext
    val name = s"cusum_t_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ms = MemoryStream[DayCount]
    val q = EventStreams.streamingCusum(spark, ms.toDS(), reference, slack, threshold)
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      spark.table(name).orderBy("event_type", "day_idx")
        .as[CusumStat].collect().toSeq
    } finally q.stop()
  }

  test("stream trajectory equals the batch fold across uneven micro-batch slicings") {
    // reference rate 10/day (sum 30 over 3 days); slack 1, threshold 5
    val ref = Map("click" -> ((30L, 3L)))
    val days = Seq(11L, 9L, 10L, 14L, 13L, 12L, 8L).zipWithIndex.map {
      case (c, i) => DayCount("click", i.toLong, c)
    }
    val expected = batchFold(days, 30L, 3L, 1.0, 5.0)
    val oneBatch = run(ref, 1.0, 5.0, Seq(days))
    val uneven = run(ref, 1.0, 5.0, Seq(days.take(2), days.slice(2, 3), days.drop(3)))
    assert(oneBatch == expected)
    assert(uneven == expected, "slicing must not change the trajectory")
  }

  test("a level shift alarms at the hand-computed day; in-control never alarms") {
    val ref = Map("view" -> ((100L, 10L))) // rate 10/day
    // in-control: ±1 around 10, slack 1 absorbs it entirely
    val calm = (0 until 20).map(i => DayCount("view", i.toLong, 10L + (i % 3) - 1L))
    assert(run(ref, 1.0, 5.0, Seq(calm)).forall(!_.alarm))
    // shift to 13/day from day 5: dev-slack = 2/day, S+ crosses 5 after 3 shifted days (day 7)
    val shifted = (0 until 10).map(i =>
      DayCount("view", i.toLong, if (i < 5) 10L else 13L))
    val got = run(ref, 1.0, 5.0, Seq(shifted))
    assert(got.filter(_.alarm).map(_.day_idx).headOption.contains(7L), got.toString)
  }

  test("an uncalibrated type dead-letters per row; calibrated types keep monitoring") {
    // ADVICE r13: a require in the task would take down the WHOLE query —
    // every calibrated type included — on one novel type. Instead the
    // unknown type's rows surface as calibrated=false alarms (an
    // unmonitorable type must still page) with no fake statistic, while
    // the calibrated type in the SAME stream monitors on undisturbed.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[DayCount]
    val name = s"cusum_uncal_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = EventStreams.streamingCusum(
      spark, ms.toDS(), Map("known" -> ((30L, 3L))), 1.0, 5.0)
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      ms.addData(DayCount("unknown", 0L, 7L), DayCount("known", 0L, 10L))
      q.processAllAvailable()
      ms.addData(DayCount("unknown", 1L, 9L), DayCount("known", 1L, 10L))
      q.processAllAvailable()
      val got = spark.table(name).as[CusumStat].collect().toSeq
      val dead = got.filter(_.event_type == "unknown")
      assert(dead.size == 2 && dead.forall(d =>
        !d.calibrated && d.alarm && d.s_pos == 0L && d.s_neg == 0L), got.toString)
      // the calibrated type's statistic is exactly the batch fold (10/day
      // on a 10/day reference with slack 1: both sums pinned at 0)
      val known = got.filter(_.event_type == "known").sortBy(_.day_idx)
      assert(known.size == 2 && known.forall(k =>
        k.calibrated && !k.alarm && k.s_pos == 0L && k.s_neg == 0L), got.toString)
    } finally q.stop()
  }

  test("referenceRate learns (sum, n) per type from a calibration frame") {
    val cal = Seq(("a", 5L), ("a", 7L), ("b", 1L)).toDF("t", "c")
    assert(EventStreams.referenceRate(cal, "t", "c") ==
      Map("a" -> ((12L, 2L)), "b" -> ((1L, 1L))))
  }
}
