package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.AsOf
import graft.streaming.EventStreams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class AsOfStreamingSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val probe = Seq(
    (1L, t("2024-01-01 10:00:00"), 100L), // after b1 -> matches b1
    (2L, t("2024-01-01 12:00:00"), 100L), // exactly at b2 -> matches b2 (<=)
    (3L, t("2024-01-01 09:00:00"), 100L), // before any build -> null
    (4L, t("2024-01-01 10:00:00"), 200L)  // other key, no build rows -> null
  ).toDF("event_id", "ts", "user_id")

  private val build = Seq(
    (90L, t("2024-01-01 09:30:00"), 100L, 1.0),  // b1
    (91L, t("2024-01-01 12:00:00"), 100L, 2.0),  // b2
    (92L, t("2024-01-01 13:00:00"), 100L, 3.0)   // later than every probe
  ).toDF("event_id", "ts", "user_id", "value")

  test("as-of join matches nearest-earlier build row per key") {
    val out = AsOf.join(probe, build, "user_id", "ts", "event_id", Seq("value"))
      .orderBy("event_id")
      .select("event_id", "asof_value")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).contains(2.0)) // same-instant build row matches
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("as-of: null-valued latest build row is NOT skipped for an older value") {
    val b = Seq(
      (90L, t("2024-01-01 09:00:00"), 100L, Some(5.0)),
      (91L, t("2024-01-01 10:00:00"), 100L, None) // latest, value null
    ).toDF("event_id", "ts", "user_id", "value")
    val p = Seq((1L, t("2024-01-01 11:00:00"), 100L)).toDF("event_id", "ts", "user_id")
    val out = AsOf.join(p, b, "user_id", "ts", "event_id", Seq("value")).collect()(0)
    // latest build row wins as a whole: its null value must come through,
    // not the older row's 5.0 (per-column last(ignoreNulls) would stitch rows)
    assert(out.isNullAt(out.fieldIndex("asof_value")))
    assert(out.getAs[Timestamp]("asof_ts") == t("2024-01-01 10:00:00"))
  }

  test("as-of: ties on (key, time) deterministically pick the highest tieBreak") {
    val b = Seq(
      (90L, t("2024-01-01 09:00:00"), 100L, 1.0),
      (95L, t("2024-01-01 09:00:00"), 100L, 2.0) // same instant, higher id
    ).toDF("event_id", "ts", "user_id", "value")
    val p = Seq((1L, t("2024-01-01 11:00:00"), 100L)).toDF("event_id", "ts", "user_id")
    val out = AsOf.join(p, b, "user_id", "ts", "event_id", Seq("value")).collect()(0)
    assert(out.getAs[Double]("asof_value") == 2.0)
  }

  test("streaming tumbling aggregation matches the batch analog") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Ev(1, t("2024-01-01 10:05:00"), 1, "click", 1.0),
      Ev(2, t("2024-01-01 10:35:00"), 1, "click", 2.0),
      Ev(3, t("2024-01-01 11:05:00"), 2, "view", 3.0),
      Ev(4, t("2024-01-01 12:40:00"), 2, "click", 4.0))
    val ms = MemoryStream[Ev]
    ms.addData(events: _*)
    val q = EventStreams.tumblingAgg(ms.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("tumble_t").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumble_t")
        .select(col("window.start").as("w"), col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("w", "event_type").collect().toSeq
      val batch = EventStreams.tumblingAgg(events.toDF())
        .select(col("window.start").as("w"), col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("w", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("streaming session windows group by gap") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(
      Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, t("2024-01-01 10:05:00"), 1, "click", 1.0),  // same session (<10m)
      Ev(3, t("2024-01-01 10:20:00"), 1, "click", 1.0),  // new session (15m gap)
      Ev(4, t("2024-01-01 10:00:00"), 2, "view", 1.0))
    val q = EventStreams.sessionAgg(ms.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("sess_t").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess_t").collect()
      assert(rows.length == 3) // user1: 2 sessions; user2: 1
      val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming session windows match the batch analog across micro-batches") {
    // The r4 gap: tumbling/sliding/state ops had streaming==batch specs,
    // session windows did not. The hard part of streaming sessions is
    // MERGING — an event in a later micro-batch lands within the gap of an
    // open session and must extend it, and two sessions a bridging event
    // connects must fuse. Data arrives in three micro-batches to force
    // exactly those paths; complete mode then lets the final state compare
    // row-for-row against sessionAgg on the same events as one batch frame.
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, t("2024-01-01 10:30:00"), 1, "click", 1.0), // separate session (30m gap)
      Ev(3, t("2024-01-01 10:00:00"), 2, "view", 1.0))
    val batch2 = Seq(
      Ev(4, t("2024-01-01 10:08:00"), 1, "click", 1.0), // extends session 1 (<10m)
      Ev(5, t("2024-01-01 10:22:00"), 1, "click", 1.0)) // bridges toward session 2
    val batch3 = Seq(
      Ev(6, t("2024-01-01 10:15:00"), 1, "click", 1.0), // fuses 10:00-10:18 with 10:22-10:40
      Ev(7, t("2024-01-01 11:00:00"), 2, "view", 1.0))  // new session for user 2
    val all = batch1 ++ batch2 ++ batch3
    val ms = MemoryStream[Ev]
    val q = EventStreams.sessionAgg(ms.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("sess_eq").start()
    try {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
      ms.addData(batch3: _*); q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(
          col("session_window.start").as("s"), col("session_window.end").as("e"),
          col("user_id"), col("n_events"))
        .orderBy("user_id", "s").collect().toSeq
      val streamed = canon(spark.table("sess_eq"))
      val batch = canon(EventStreams.sessionAgg(all.toDF()))
      assert(streamed == batch)
      // user 1 fused into ONE 10:00-10:40 session of 5 events; user 2 has 2
      val u1 = streamed.filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.size == 1 && u1.head.getAs[Long]("n_events") == 5L)
      assert(streamed.count(_.getAs[Long]("user_id") == 2L) == 2)
      // and the q43 rollup shape (n_sessions per user) agrees too
      val rollup = spark.table("sess_eq").groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions")).orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rollup == Seq((1L, 1L), (2L, 2L)))
    } finally q.stop()
  }

  test("append-mode session windows finalize only past the watermark (bounded state)") {
    // Complete mode (above) proves values; append mode proves STATE
    // BOUNDS: a session is emitted exactly once, only after the watermark
    // passes its close — which is what lets the state store hold open
    // sessions rather than the stream's history. Watermarks advance at
    // batch boundaries from the PREVIOUS batch's max event time, hence the
    // nudge batch.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = EventStreams.sessionAgg(ms.toDF())
      .writeStream.outputMode("append").format("memory").queryName("sess_wm").start()
    try {
      ms.addData(
        Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, t("2024-01-01 10:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_wm").isEmpty) // session open: nothing emitted
      ms.addData(Ev(3, t("2024-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(4, t("2024-01-01 12:01:00"), 1, "click", 1.0)) // nudge: batch runs with watermark 11:50
      q.processAllAvailable()
      val rows = spark.table("sess_wm")
        .select(col("session_window.start").as("s"), col("user_id"), col("n_events"))
        .collect()
      assert(rows.length == 1) // ONLY the closed 10:00-10:15 session; 12:00+ still open
      assert(rows.head.getAs[Long]("n_events") == 2L)
      assert(rows.head.getAs[java.sql.Timestamp]("s") == t("2024-01-01 10:00:00"))
    } finally q.stop()
  }

  test("file-source streaming over the real events parquet matches batch") {
    val batchEvents = graft.core.Tables.events(spark, sf0001)
    // file sources stream directories; stage the fixture into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val streamEvents = spark.readStream.schema(rawSchema).parquet(dir.toString)
    // raw streaming read sees the un-normalized ts; apply the same policy
    val streamFixed = graft.core.Tables.normalizeEventTs(streamEvents)
    val q = EventStreams.tumblingAgg(streamFixed)
      .writeStream.outputMode("complete").format("memory").queryName("file_t").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_t")
        .select(col("window.start").as("w"), col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("w", "event_type").collect().toSeq
      val batch = EventStreams.tumblingAgg(batchEvents)
        .select(col("window.start").as("w"), col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("w", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch parquet sink: per-micro-batch writes converge to the batch analog") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val dir = java.nio.file.Files.createTempDirectory("fb_sink").toString + "/agg"
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val first = Seq(
      Ev(1, t("2024-01-01 10:05:00"), 1, "click", 1.0),
      Ev(2, t("2024-01-01 10:35:00"), 1, "click", 2.0))
    val second = Seq(
      Ev(3, t("2024-01-01 11:05:00"), 2, "view", 3.0),
      Ev(4, t("2024-01-01 12:40:00"), 2, "click", 4.0))
    val q = EventStreams.startForeachBatchParquet(
      EventStreams.tumblingAgg(ms.toDF()), dir, _ => { batches.incrementAndGet(); () })
    try {
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
      val written = spark.read.parquet(dir)
        .select(col("window.start").as("w"), col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("w", "event_type").collect().toSeq
      val batch = EventStreams.tumblingAgg((first ++ second).toDF())
        .select(col("window.start").as("w"), col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("w", "event_type").collect().toSeq
      assert(written == batch)
      assert(written.size == 3)
      assert(batches.get() >= 2, s"expected one foreachBatch call per micro-batch, got ${batches.get()}")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch analog and bounds state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Ev(1, t("2024-01-01 10:30:00"), 1, "click", 1.0),
      Ev(2, t("2024-01-01 12:00:00"), 1, "click", 2.0),
      Ev(3, t("2024-01-01 10:30:00"), 2, "click", 3.0))
    val views = Seq(
      Ev(10, t("2024-01-01 10:10:00"), 1, "view", 0.0), // within 30m of click 1
      Ev(11, t("2024-01-01 11:50:00"), 1, "view", 0.0), // within 30m of click 2
      Ev(12, t("2024-01-01 09:00:00"), 2, "view", 0.0)) // too early for click 3
    val msL = MemoryStream[Ev]
    val msR = MemoryStream[Ev]
    msL.addData(clicks: _*)
    msR.addData(views: _*)
    val q = EventStreams.intervalJoin(msL.toDF(), msR.toDF())
      .writeStream.outputMode("append").format("memory").queryName("ssj_t").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_t")
        .select("l_id", "r_id").orderBy("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val batch = EventStreams.intervalJoin(clicks.toDF(), views.toDF())
        .select("l_id", "r_id").orderBy("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(streamed == batch)
      assert(streamed == Seq((1L, 10L), (2L, 11L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(
      Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(1, t("2024-01-01 10:00:30"), 1, "click", 1.0), // dup id within watermark
      Ev(2, t("2024-01-01 10:01:00"), 1, "click", 1.0))
    val q = EventStreams.dedupEvents(ms.toDF())
      .writeStream.outputMode("append").format("memory").queryName("dedup_t").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_t").select("event_id").distinct().count() ==
        spark.table("dedup_t").count())
      assert(spark.table("dedup_t").count() == 2)
    } finally q.stop()
  }
}
