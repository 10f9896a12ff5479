package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.DdSketch
import graft.streaming.EventStreams

/** [[EventStreams.quantileAgg]] — the streaming DdSketch monitor must
  * equal the batch run of the SAME plan on the same data (sketches are
  * mergeable, so micro-batch boundaries cannot change the result), and
  * the reported quantiles must respect DdSketch's relative-error bound
  * against exact percentiles. */
class StreamQuantilesSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val events = (1 to 200).map { i =>
    val minute = if (i <= 120) "10:00" else "10:01"
    val tpe = if (i % 3 == 0) "view" else "click"
    Ev(i.toLong, t(s"2024-01-01 $minute:${10 + i % 40}"), i.toLong % 7, tpe, i.toDouble)
  }

  test("streaming quantile monitor equals the batch analog across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = EventStreams.quantileAgg(ms.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("quant_t").start()
    try {
      // three uneven micro-batches: merge order must not matter
      ms.addData(events.take(50): _*)
      q.processAllAvailable()
      ms.addData(events.slice(50, 57): _*)
      ms.addData(events.drop(57): _*)
      q.processAllAvailable()
      val streamed = spark.table("quant_t")
        .orderBy("w_start", "event_type").collect().toSeq
      val batch = EventStreams.quantileAgg(events.toDF())
        .orderBy("w_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.size == 4) // 2 windows x 2 types
      assert(streamed.map(_.getAs[Long]("n")).sum == 200L)
    } finally q.stop()
  }

  test("reported quantiles respect the sketch's relative-error bound") {
    val out = EventStreams.quantileAgg(events.toDF())
      .filter(col("event_type") === "click" && col("w_start") === t("2024-01-01 10:00:00"))
      .collect()(0)
    val exact = events.filter(e => e.event_type == "click" && e.ts.before(t("2024-01-01 10:01:00")))
      .map(_.value).sorted
    // the sketch's own rank convention (ceil(q·n), 1-based) — isolating
    // the BUCKET error, which is the advertised Alpha guarantee
    def pct(q: Double): Double =
      exact(math.max(1L, math.ceil(q * exact.length).toLong).toInt - 1)
    Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99").foreach { case (q, cname) =>
      val got = out.getAs[Double](cname)
      assert(math.abs(got - pct(q)) / pct(q) <= 1.5 * DdSketch.Alpha,
        s"$cname: $got vs ${pct(q)}")
    }
  }

  test("p50 <= p90 <= p99 for every emitted group") {
    EventStreams.quantileAgg(events.toDF()).collect().foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
    }
  }
}
