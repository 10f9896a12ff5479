package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Stream-static enrichment: per-micro-batch broadcast join against a
  * dimension — no streaming state, unmatched facts kept. */
class StreamStaticEnrichSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val dim = Seq((100L, "gold"), (200L, "basic"))
    .toDF("user_id", "tier")

  test("micro-batches enrich from the broadcast dim; unmatched events survive") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = EventStreams.enrichWithDim(ms.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out").outputMode("append")
      .start()
    try {
      ms.addData(
        Ev(1L, t("2024-01-01 10:00:00"), 100L, "view", 1.0),
        Ev(2L, t("2024-01-01 10:01:00"), 300L, "view", 2.0)) // no dim row
      q.processAllAvailable()
      ms.addData(Ev(3L, t("2024-01-01 10:02:00"), 200L, "buy", 3.0))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("event_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> None, 3L -> Some("basic")))
    } finally q.stop()
  }

  test("the join broadcasts the dim (batch analog plan)") {
    val events = Seq(Ev(1L, t("2024-01-01 10:00:00"), 100L, "view", 1.0))
      .toDF()
    val joined = EventStreams.enrichWithDim(events, dim, "user_id")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")
  }
}
