package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{TermEvent, TrendRow}

/** Streaming trending terms ([[EventStreams.trendingTerms]]): emitted
  * top-k per closed window equals the exact batch top-k (sketch wide
  * enough for exactness), windows emit only when the watermark passes,
  * and ranks/tie-breaks are deterministic. */
class TrendingTermsSpec extends SparkSuite {
  import spark.implicits._

  private val W = 60000L // 1-minute windows

  private def ev(sec: Long, term: String) = TermEvent(new Timestamp(sec * 1000), term)

  private def run(batches: Seq[Seq[TermEvent]], k: Int = 3): Seq[TrendRow] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TermEvent]
    val q = EventStreams.trendingTerms(
      spark, ms.toDS(), windowMs = W, k = k, sketch = 64, watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("trend_t").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      spark.table("trend_t").as[TrendRow].collect().toSeq
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS trend_t")
    }
  }

  test("closed window emits the exact top-k with deterministic ranks") {
    // window [0, 60): aa x3, bb x2, cc x1, dd x1 (cc beats dd on the tie)
    val w1 = Seq(
      ev(1, "aa"), ev(2, "aa"), ev(3, "aa"),
      ev(4, "bb"), ev(5, "bb"), ev(6, "cc"), ev(7, "dd"))
    // an event far in the next window pushes the watermark past 60s
    val got = run(Seq(w1, Seq(ev(500, "zz"))))
    val w1rows = got.filter(_.window_start.getTime == 0L)
    assert(w1rows.map(r => (r.rk, r.term, r.cnt_est)).sorted ==
      Seq((1, "aa", 3L), (2, "bb", 2L), (3, "cc", 1L)))
  }

  test("open windows emit nothing until the watermark closes them") {
    val got = run(Seq(Seq(ev(1, "aa"), ev(2, "bb"))))
    assert(got.isEmpty)
  }

  test("multiple windows close independently with their own top-k") {
    val got = run(Seq(
      Seq(ev(1, "aa"), ev(2, "aa"), ev(3, "bb")),         // window 0
      Seq(ev(70, "xx"), ev(75, "xx"), ev(80, "yy")),      // window 60
      Seq(ev(5000, "zz"))))                               // closes both
    val byWindow = got.groupBy(_.window_start.getTime)
    assert(byWindow(0L).maxBy(_.cnt_est).term == "aa")
    assert(byWindow(60000L).maxBy(_.cnt_est).term == "xx")
  }

  test("state stays bounded: a term flood emits only k rows per window") {
    val flood = (1 to 200).map(i => ev(i % 50 + 1, s"t${i % 120}"))
    val got = run(Seq(flood, Seq(ev(900, "zz"))), k = 5)
    assert(got.count(_.window_start.getTime == 0L) == 5)
  }
}
