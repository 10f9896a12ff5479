package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Contingency
import graft.streaming.EventStreams

/** [[EventStreams.streamingSrm]] — the continuous sample-ratio-mismatch
  * monitor must equal the batch [[Contingency.srm]] statistic on each
  * window's slice, fire exactly where the batch gate would, be invariant
  * to micro-batch slicing, and dead-letter (not refuse) undeclared
  * arms. */
class SrmStreamSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private val half = Seq("a" -> 0.5, "b" -> 0.5)

  // window 10:00 balanced (100/100); window 11:00 skewed (180/20)
  private val events: Seq[(Timestamp, String)] =
    (1 to 200).map(i => (t(f"2024-01-01 10:00:${i % 60}%02d"),
      if (i % 2 == 0) "a" else "b")) ++
      (1 to 200).map(i => (t(f"2024-01-01 11:00:${i % 60}%02d"),
        if (i <= 180) "a" else "b"))

  test("per-window statistic equals the batch srm on the window slice; alarm fires on the skew") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val q = EventStreams.streamingSrm(
        ms.toDF().toDF("ts", "arm"), "arm", "ts", half)
      .writeStream.outputMode("complete").format("memory").queryName("srm_t").start()
    try {
      // uneven micro-batches: the conditional counters must not care
      ms.addData(events.take(37): _*)
      q.processAllAvailable()
      ms.addData(events.slice(37, 240): _*)
      ms.addData(events.drop(240): _*)
      q.processAllAvailable()
      val rows = spark.table("srm_t").orderBy("w_start").collect()
      assert(rows.length == 2)
      val Array(balanced, skewed) = rows
      assert(balanced.getAs[Long]("n") == 200 && skewed.getAs[Long]("n") == 200)
      assert(balanced.getAs[Long]("undeclared_n") == 0)
      assert(balanced.getAs[Double]("chi2") < 1e-9 && !balanced.getAs[Boolean]("srm"))
      // 180/20 on 50/50: chi2 = 2·80²/100 = 128
      assert(math.abs(skewed.getAs[Double]("chi2") - 128.0) < 1e-9)
      assert(skewed.getAs[Boolean]("srm"))
      // each window's (chi2, p) equals the batch gate on that slice
      Seq(("10", balanced), ("11", skewed)).foreach { case (hh, got) =>
        val slice = events.filter(_._1.toString.contains(s" $hh:"))
          .map(_._2).map(Tuple1(_)).toDF("arm")
        val batch = Contingency.srm(slice, "arm", half).head
        assert(math.abs(batch.getAs[Double]("chi2") - got.getAs[Double]("chi2")) < 1e-12)
        assert(math.abs(batch.getAs[Double]("p_srm") - got.getAs[Double]("p_srm")) < 1e-12)
        assert(batch.getAs[Boolean]("srm") == got.getAs[Boolean]("srm"))
      }
    } finally q.stop()
  }

  test("undeclared arms dead-letter into undeclared_n and force the alarm; declared stats stay honest") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val q = EventStreams.streamingSrm(
        ms.toDF().toDF("ts", "arm"), "arm", "ts", half)
      .writeStream.outputMode("complete").format("memory").queryName("srm_u").start()
    try {
      val mixed = (1 to 50).map(i => (t(f"2024-01-01 10:00:${i % 60}%02d"),
        if (i % 2 == 0) "a" else "b")) ++
        (1 to 3).map(i => (t(s"2024-01-01 10:01:0$i"), "mystery")) ++
        // a window with ONLY undeclared rows: no statistic, alarm anyway
        Seq((t("2024-01-01 11:00:01"), "ghost"))
      ms.addData(mixed: _*)
      q.processAllAvailable()
      val rows = spark.table("srm_u").orderBy("w_start").collect()
      assert(rows.length == 2)
      val first = rows(0)
      assert(first.getAs[Long]("n") == 50 && first.getAs[Long]("undeclared_n") == 3)
      // declared counts are balanced — the statistic itself is clean...
      assert(first.getAs[Double]("chi2") < 1e-9)
      // ...but an undeclared arm IS an assignment bug: alarm rides true
      assert(first.getAs[Boolean]("srm"))
      val ghost = rows(1)
      assert(ghost.getAs[Long]("n") == 0 && ghost.getAs[Long]("undeclared_n") == 1)
      assert(ghost.isNullAt(ghost.fieldIndex("chi2")) &&
        ghost.isNullAt(ghost.fieldIndex("p_srm")))
      assert(ghost.getAs[Boolean]("srm"))
    } finally q.stop()
  }

  test("declaration-time refusals match the batch gate") {
    val df = Seq((t("2024-01-01 10:00:00"), "a")).toDF("ts", "arm")
    assert(intercept[IllegalArgumentException](
      EventStreams.streamingSrm(df, "arm", "ts", Seq("a" -> 1.0)))
      .getMessage.contains("two"))
    assert(intercept[IllegalArgumentException](
      EventStreams.streamingSrm(df, "arm", "ts", Seq("a" -> 0.7, "b" -> 0.7)))
      .getMessage.contains("sum to 1"))
  }
}
