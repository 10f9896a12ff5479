package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery,
  TTLConfig, TimeMode, TimerValues, ValueState}

import graft.core.Fmt.r6

/** Structured Streaming surface (SURVEY.md §2.10). Every transform here is
  * source-agnostic: it accepts either a streaming DataFrame (readStream /
  * MemoryStream) or a batch one — the same plan runs in both modes, which
  * is how the declared queries Q19/Q20/Q43 are oracle-checked in batch
  * while the streaming path is spec-tested with a memory sink.
  *
  * Watermarks bound state: tumbling/sliding aggregations drop state for
  * windows older than the watermark; dedup keeps only in-watermark keys.
  * At 100 TB/day the state store holds (windows x event_types) rows, not
  * events.
  */
object EventStreams {

  /** Tumbling 1-hour counts/sums per event type, 10-minute watermark. */
  def tumblingAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    (if (events.isStreaming) events.withWatermark("ts", watermark) else events)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), r6(sum(col("value"))).as("sum_value"))

  /** Sliding 1-hour / 30-minute aggregate. */
  def slidingAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    (if (events.isStreaming) events.withWatermark("ts", watermark) else events)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), r6(sum(col("value"))).as("sum_value"))

  /** Session windows (10-minute gap) per user. */
  def sessionAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    (if (events.isStreaming) events.withWatermark("ts", watermark) else events)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Stateful exact dedup by event id. In streaming mode with a watermark,
    * `dropDuplicatesWithinWatermark` bounds the key state. */
  /** Streaming latency/quality quantile monitor: per (tumbling minute,
    * event_type) a mergeable DdSketch of `value`, finished into
    * p50/p90/p99 — the live "is p99 degrading" dashboard feed. The
    * sketch is the aggregation STATE, so per-window-per-type state is
    * bounded by the value dynamic range over gamma (~hundreds of
    * buckets), never by event count; the watermark retires closed
    * windows. Relative-error contract is DdSketch's (±1% per bucket
    * bound), identical in batch and streaming because both run the same
    * Aggregator — StreamQuantilesSpec pins stream == batch equality. */
  def quantileAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(
        graft.functions.DdSketch.sketch(col("value")).as("sk"),
        count(lit(1)).as("n"))
      .select(
        col("window.start").as("w_start"), col("event_type"), col("n"),
        r6(graft.functions.DdSketch.quantileOf(col("sk"), 0.5)).as("p50"),
        r6(graft.functions.DdSketch.quantileOf(col("sk"), 0.9)).as("p90"),
        r6(graft.functions.DdSketch.quantileOf(col("sk"), 0.99)).as("p99"))

  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream interval join (SURVEY §2.10 surface): pair each left
    * event with right events of the same user in the trailing `window`.
    * Watermarks on BOTH sides plus the time-bound condition let Spark
    * evict join state — without them a stream-stream join buffers forever.
    * State held per key ≈ one watermark-window of events, not the stream.
    * Works identically on batch frames (no watermark, plain interval
    * join), which is how the spec cross-checks it.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      window: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark("ts", watermark) else left)
      .select(
        col("event_id").as("l_id"), col("ts").as("l_ts"),
        col("user_id").as("l_user"), col("value").as("l_value"))
    val r = (if (right.isStreaming) right.withWatermark("ts", watermark) else right)
      .select(col("event_id").as("r_id"), col("ts").as("r_ts"), col("user_id").as("r_user"))
    l.join(
      r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $window") &&
        col("r_ts") <= col("l_ts"))
      .select(col("l_id"), col("r_id"), col("l_user").as("user_id"), col("l_value"))
  }

  /** Streaming non-conversion detector: left events (e.g. clicks) that
    * saw NO right event (e.g. purchase) from the same user within
    * `window` AFTER them — the abandoned-intent feed. Structured
    * Streaming's stream-stream LEFT OUTER interval join holds each left
    * row in state until the watermark passes its join window, emits the
    * match if one arrived, and emits the row with a NULL right side
    * otherwise; filtering the NULLs yields exactly the non-converters,
    * with state bounded by watermark + window like every interval join.
    * Rows only materialize after the watermark CLOSES their window, so
    * in tests advance event time past `l_ts + window + watermark`. */
  def unmatchedWithin(
      left: DataFrame, right: DataFrame,
      window: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark("ts", watermark) else left)
      .select(
        col("event_id").as("l_id"), col("ts").as("l_ts"),
        col("user_id").as("l_user"), col("value").as("l_value"))
    val r = (if (right.isStreaming) right.withWatermark("ts", watermark) else right)
      .select(col("event_id").as("r_id"), col("ts").as("r_ts"), col("user_id").as("r_user"))
    l.join(
        r,
        col("l_user") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"),
        "left_outer")
      .filter(col("r_id").isNull)
      .select(col("l_id"), col("l_user").as("user_id"), col("l_ts").as("ts"), col("l_value"))
  }

  /** Stream-static enrichment: join each micro-batch against a broadcast
    * dimension — the standard streaming enrich shape (events + user/dim
    * attributes). The static side is planned per micro-batch, so a
    * broadcast of the dim (not a stateful stream-stream join) is the
    * right tool whenever the dimension fits the broadcast budget: no
    * streaming state at all, and dim updates are picked up on the next
    * batch when the static side is a re-readable source. Left join keeps
    * unmatched events (dim gaps must not drop facts). */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** `foreachBatch` sink (SURVEY §2.10 sink row; VERDICT r1 item 7) — the
    * sink production streaming jobs actually use: each micro-batch arrives
    * as a normal DataFrame, so any batch writer (parquet here, a JDBC
    * upsert, a merge) applies. Complete output mode means every batch
    * carries the full aggregate state, so an overwrite leaves the sink
    * equal to the batch analog of all data seen so far; `onBatch` is a
    * test/metrics hook invoked per micro-batch.
    */
  def startForeachBatchParquet(
      agg: DataFrame,
      path: String,
      onBatch: Long => Unit = _ => ()): StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Complete)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(batchId)
        batch.write.mode("overwrite").parquet(path)
      }
      .start()

  /** Exactly-once table sink: append each micro-batch to a
    * [[graft.io.VersionedTable]] keyed by (writerId, batchId). Structured
    * Streaming's `foreachBatch` is at-least-once — a crash between the
    * sink write and the checkpoint commit replays the batch on restart —
    * and the versioned table's idempotent
    * [[graft.io.VersionedTable.commitStreamBatch]] absorbs the replay, so
    * the TABLE is exactly-once even though the delivery is not. Append
    * output mode: each batch carries only new finalized rows (pair with a
    * watermark upstream for aggregates). `onBatch` reports (batchId,
    * Some(version) committed | None skipped-as-duplicate). */
  /** Continuous bronze→silver TABLE MIRROR: the versioned-table stream
    * source (`graft-vt-stream`) feeding the exactly-once versioned sink —
    * source offsets (table versions) and destination idempotence
    * ((consumerId, batchId) txn gate) are both engine-checkpointed, so
    * the mirror survives crash/restart with no duplicated or lost rows.
    * The first batch bootstraps the full snapshot; every later batch
    * copies only the files that joined the source manifest. This is the
    * streaming (always-on) form of [[graft.io.VersionedTable
    * .mirrorChanges]] — use that for scheduled pull-based catch-up, this
    * to keep a hot replica continuously current. `transform` lets the
    * silver side reshape each batch (the medallion step) before it
    * lands. */
  def startTableMirror(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String,
      dstPath: String,
      consumerId: String,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity): StreamingQuery =
    spark.readStream.format("graft-vt-stream").option("path", srcPath).load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.io.VersionedTable.commitStreamBatch(
          transform(batch.toDF()), dstPath, consumerId, batchId)
        ()
      }
      .start()

  /** Fan ONE stream out to SEVERAL versioned tables in a single query —
    * the medallion fanout (same batch lands as raw copy, filtered view,
    * aggregate …) with per-destination exactly-once: each table is
    * guarded by its own `(writerId.i, batchId)` txn gate, so a crash
    * anywhere BETWEEN the per-table commits replays the whole batch and
    * every destination independently absorbs (already-committed) or
    * applies (missed) it. There is no cross-table transaction — the
    * guarantee is convergence: after the replay, each table holds
    * exactly one copy of every batch (spec-forced, including the
    * crash-between-sinks window). The batch is persisted once so N
    * destinations don't recompute the source scan N times. */
  def startFanoutVersionedSink(
      stream: DataFrame,
      sinks: Seq[(String, DataFrame => DataFrame)],
      writerId: String,
      checkpointDir: String): StreamingQuery = {
    require(sinks.nonEmpty, "no fanout destinations")
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyFanout(batch.toDF(), batchId, sinks, writerId)
      }
      .start()
  }

  /** The fanout batch body, exposed for crash-replay forcing in specs. */
  private[graft] def applyFanout(
      batch: DataFrame, batchId: Long,
      sinks: Seq[(String, DataFrame => DataFrame)], writerId: String): Unit = {
    val b = batch.persist()
    try sinks.zipWithIndex.foreach { case ((path, transform), i) =>
      graft.io.VersionedTable.commitStreamBatch(
        transform(b), path, s"$writerId.$i", batchId)
    } finally { b.unpersist(); () }
  }

  def startExactlyOnceVersionedSink(
      stream: DataFrame,
      tablePath: String,
      writerId: String,
      checkpointDir: String,
      onBatch: (Long, Option[Long]) => Unit = (_, _) => ()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(batchId,
          graft.io.VersionedTable.commitStreamBatch(batch.toDF(), tablePath, writerId, batchId))
      }
      .start()

  /** Exactly-once sink into a HASH-BUCKETED versioned table
    * ([[graft.io.VersionedTable.commitBucketedBatch]]): each micro-batch
    * shuffles once into the table's bucket layout and adds one file per
    * bucket, so the table stays JOIN-READY continuously — downstream
    * co-bucketed joins keep planning with zero exchanges while the
    * stream runs, no nightly re-cluster. Same (writerId, batchId) replay
    * absorption as [[startExactlyOnceVersionedSink]]. */
  def startBucketedVersionedSink(
      stream: DataFrame,
      tablePath: String,
      key: String,
      nBuckets: Int,
      writerId: String,
      checkpointDir: String,
      onBatch: (Long, Option[Long]) => Unit = (_, _) => ()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(batchId, graft.io.VersionedTable.commitBucketedBatch(
          batch.toDF(), tablePath, key, nBuckets, writerId, batchId))
      }
      .start()

  /** [[startBucketedVersionedSink]] on a COMPOSITE key: the micro-batches
    * land tuple-hashed (see [[graft.io.VersionedTable.commitBucketed]]'s
    * Seq overload — key order matters), so a continuously-ingested fact
    * whose natural co-location key is composite stays join-ready too. */
  def startBucketedVersionedSink(
      stream: DataFrame, tablePath: String, keys: Seq[String], nBuckets: Int,
      writerId: String, checkpointDir: String): StreamingQuery = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    startBucketedVersionedSink(
      stream, tablePath, keys.mkString(","), nBuckets, writerId, checkpointDir)
  }

  /** AUDITED exactly-once sink — write-audit-publish per micro-batch
    * ([[graft.io.VersionedTable.stageAppend]] family): every batch lands
    * as an INVISIBLE stage, the caller's `audit` runs against exactly
    * the staged rows, and only a clean batch publishes (metadata-only
    * adoption under the (writerId, batchId) txn — replays after a crash
    * converge like [[startExactlyOnceVersionedSink]]'s, the replayed
    * stage aborted). A failing batch routes WHOLE to the quarantine
    * table with its violation messages, under the same txn discipline —
    * so the main table only ever contains audited data and nothing is
    * lost or double-counted either way. An audit that THROWS aborts the
    * stage and fails the query (no orphan files). */
  def startAuditedVersionedSink(
      stream: DataFrame,
      tablePath: String,
      quarantinePath: String,
      writerId: String,
      checkpointDir: String,
      audit: DataFrame => Seq[String],
      onBatch: (Long, Either[Seq[String], Option[Long]]) => Unit =
        (_, _) => ()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import graft.io.VersionedTable
        val spark = batch.sparkSession
        val staged = VersionedTable.stageAppend(batch.toDF(), tablePath)
        val violations =
          try audit(VersionedTable.readStaged(spark, tablePath, staged))
          catch {
            case t: Throwable =>
              VersionedTable.abortStaged(spark, tablePath, staged)
              throw t
          }
        if (violations.isEmpty) {
          val v = VersionedTable.publishStagedBatch(
            spark, tablePath, staged, writerId, batchId)
          if (v.isEmpty) // replayed batch: already adopted once
            VersionedTable.abortStaged(spark, tablePath, staged)
          onBatch(batchId, Right(v))
        } else {
          VersionedTable.commitStreamBatch(
            VersionedTable.readStaged(spark, tablePath, staged)
              .withColumn("_audit_failures", lit(violations.mkString("; "))),
            quarantinePath, writerId, batchId)
          VersionedTable.abortStaged(spark, tablePath, staged)
          onBatch(batchId, Left(violations))
        }
      }
      .start()

  /** Streaming CDC apply: each micro-batch is a keyed upsert/delete set
    * MERGED into a [[graft.io.VersionedTable]] — the Kafka-CDC-to-table
    * landing pattern (Debezium → MERGE INTO). Rows whose `deleteFlag`
    * column is true delete their key; other rows replace-or-insert.
    * Exactly-once the same way [[startExactlyOnceVersionedSink]] is:
    * foreachBatch delivery is at-least-once, and the table absorbs
    * replays through [[graft.io.VersionedTable.mergeBatch]]'s
    * (writerId, batchId) txn gate — a crash between merge-commit and
    * checkpoint re-merges as a no-op. Within a batch the source must be
    * key-unique (CDC compaction upstream: keep the LAST image per key —
    * mergeBatch throws on duplicates rather than guessing an order).
    * File surgery per batch is bounded by the batch's key footprint via
    * manifest range stats and bloom sidecars when the table records
    * them. */
  def startCdcMergeSink(
      stream: DataFrame,
      tablePath: String,
      keys: Seq[String],
      writerId: String,
      checkpointDir: String,
      deleteFlag: Option[String] = None,
      onBatch: (Long, Option[graft.io.VersionedTable.MergeResult]) => Unit =
        (_, _) => ()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(batchId,
          graft.io.VersionedTable.mergeBatch(
            batch.sparkSession, tablePath, batch.toDF(), keys, writerId, batchId,
            deleteFlag))
      }
      .start()

  /** Streaming-maintained materialized view: each micro-batch's partial
    * aggregates merge into the [[graft.ops.MaterializedRollup]] state
    * table under the batch's (writerId, batchId) txn — so the refresh is
    * replay-proof AND the view is continuously current without ever
    * re-scanning history. This is the streaming half of incremental view
    * maintenance: per batch, one keyed shuffle of the increment plus a
    * merge against one-row-per-group state. */
  def startMaterializedRollupSink(
      stream: DataFrame,
      tablePath: String,
      writerId: String,
      checkpointDir: String,
      groupCols: Seq[String],
      valueCol: String,
      ndvCol: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.MaterializedRollup.refresh(
          batch.sparkSession, tablePath, batch.toDF(), groupCols, valueCol, ndvCol,
          txn = Some(writerId -> batchId))
        ()
      }
      .start()

  /** Arbitrary per-key state (SURVEY §2.10 `flatMapGroupsWithState` row):
    * running per-user event count + value total, emitting one update per
    * user per micro-batch. State is two numbers per user — bounded. */
  final case class UserEvent(user_id: Long, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  def runningUserTotals(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e => n += 1; total += e.value }
          val next = UserRunning(user, n, total)
          state.update(next)
          Iterator(next)
      }
  }

  /** The same running totals through Spark 4's `transformWithState` — the
    * modern arbitrary-state operator (typed state handles with TTL, timers,
    * multiple state variables per key) that supersedes
    * `flatMapGroupsWithState`. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `...state.RocksDBStateStoreProvider`) — the store production clusters
    * run anyway for large state; the spec sets it per query. State here is
    * one `ValueState[UserRunning]` per user — bounded, TTL-able. */
  class RunningTotalsProcessor extends StatefulProcessor[Long, UserEvent, UserRunning] {
    @transient private var state: ValueState[UserRunning] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning](
        "totals", Encoders.product[UserRunning], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev = if (state.exists()) state.get() else UserRunning(user, 0L, 0.0)
      var n = prev.n_events
      var total = prev.total_value
      rows.foreach { e => n += 1; total += e.value }
      val next = UserRunning(user, n, total)
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningUserTotalsTws(
      spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Streaming twin of [[graft.ops.Funnel]] — per-user ordered-funnel
    * progress maintained incrementally across micro-batches. State per
    * user is the SAME (reached, first, last) accumulator the batch fold
    * carries: three numbers, bounded regardless of history length, so a
    * 100 TB-scale funnel holds |users|·3 values of state, never events.
    *
    * Within a micro-batch events are sorted before folding; across
    * batches the fold is order-sensitive by design (strict `>` progress),
    * so the streaming result equals the batch result whenever each user's
    * events arrive in non-decreasing time order across batches — the
    * delivery guarantee a keyed log (e.g. Kafka partitioned by user)
    * provides. Cross-batch REGRESSIONS (an old event arriving after a
    * newer one advanced the funnel) are ignored, matching the batch
    * min-chain only under in-order delivery; FunnelStreamSpec pins both
    * the equality and the documented divergence case. */
  final case class FunnelEvent(user_id: Long, us: Long, event_type: String)
  final case class FunnelProgress(user_id: Long, reached: Int, first_us: Long, last_us: Long)

  def streamingFunnel(
      spark: SparkSession, events: Dataset[FunnelEvent],
      stages: Seq[String]): Dataset[FunnelProgress] = {
    import spark.implicits._
    val n = stages.length
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          val prev = state.getOption
            .getOrElse(FunnelProgress(user, 0, Long.MinValue, Long.MinValue))
          var st = prev
          batch.toSeq.sortBy(e => (e.us, e.event_type)).foreach { e =>
            if (st.reached < n && e.event_type == stages(st.reached) && e.us > st.last_us)
              st = FunnelProgress(
                user, st.reached + 1,
                if (st.reached == 0) e.us else st.first_us, e.us)
          }
          if (st != prev) { state.update(st); Iterator.single(st) }
          else Iterator.empty
      }
  }

  /** Streaming twin of [[graft.ops.Sessionize.assignSessions]] — tag
    * every EVENT with its 1-based session index, maintained incrementally
    * across micro-batches. State per key is (last event time, session
    * counter): two numbers, bounded regardless of history length — at
    * 100 TB the state store holds |users|·2 values, never events.
    *
    * Within a micro-batch events sort by (us, event_id) before the fold;
    * across batches the assignment equals the batch two-window
    * construction whenever each key's events arrive in non-decreasing
    * time order across batches (the keyed-log delivery guarantee). A
    * LATE cross-batch event computes its gap against the max time seen —
    * it joins the current session rather than re-splitting history (the
    * batch op, seeing all events, may number differently); documented
    * divergence, pinned by SessionizeStreamSpec alongside the in-order
    * equality. */
  final case class SessionEvent(user_id: Long, us: Long, event_id: Long)
  final case class SessionizedEvent(
      user_id: Long, us: Long, event_id: Long, session_id: Long)

  def streamingSessionize(
      spark: SparkSession, events: Dataset[SessionEvent],
      gapUs: Long): Dataset[SessionizedEvent] = {
    import spark.implicits._
    require(gapUs > 0, "gap must be positive")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[(Long, Long)]) =>
          var (lastUs, sess) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = batch.toSeq.sortBy(e => (e.us, e.event_id)).map { e =>
            if (sess == 0L || e.us - lastUs > gapUs) sess += 1
            lastUs = math.max(lastUs, e.us)
            SessionizedEvent(user, e.us, e.event_id, sess)
          }
          state.update((lastUs, sess))
          out.iterator
      }
  }

  /** Streaming twin of the q203 batch drift monitor: per event type,
    * maintain live binned value counts in keyed state and emit the
    * binned two-sample KS statistic against a fixed REFERENCE
    * distribution after every micro-batch — same exact-integer form
    * (max |S_ref·n_live − S_live·n_ref|), same bin rule
    * (`floor(value / binWidth)`).
    *
    * State per event type is one bin→count map — bounded by the value
    * range over the bin width (~dozens of entries), NOT by stream
    * length, so it needs no watermark to stay small. The reference
    * histogram (types × bins, same bound) ships in the task closure.
    * DriftStreamSpec pins stream-final == batch-recomputed equality. */
  final case class ValueEvent(event_type: String, value: Double)
  final case class DriftStat(
      event_type: String, n_live: Long, ks_scaled: Long, ks: Double)

  /** Build the reference histogram from a batch frame (two columns:
    * type, value): the driver-side Map the streaming monitor compares
    * against. Bounded by types × bins. */
  def referenceBins(
      df: DataFrame, typeCol: String, valueCol: String,
      binWidth: Double): Map[String, Map[Long, Long]] =
    df.select(
        col(typeCol).as("t"),
        floor(col(valueCol) / lit(binWidth)).cast("long").as("b"))
      .groupBy("t", "b").count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.map(r => r._2 -> r._3).toMap }

  def streamingDrift(
      spark: SparkSession, events: Dataset[ValueEvent],
      reference: Map[String, Map[Long, Long]],
      binWidth: Double = 10.0): Dataset[DriftStat] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (t: String, batch: Iterator[ValueEvent], state: GroupState[Map[Long, Long]]) =>
          val upd = batch.foldLeft(state.getOption.getOrElse(Map.empty[Long, Long])) {
            (m, e) =>
              val b = math.floor(e.value / binWidth).toLong
              m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          state.update(upd)
          val ref = reference.getOrElse(t, Map.empty[Long, Long])
          val nRef = ref.values.sum
          val nLive = upd.values.sum
          var (sRef, sLive, best) = (0L, 0L, 0L)
          (ref.keySet ++ upd.keySet).toSeq.sorted.foreach { b =>
            sRef += ref.getOrElse(b, 0L)
            sLive += upd.getOrElse(b, 0L)
            best = math.max(best, math.abs(sRef * nLive - sLive * nRef))
          }
          val ks = if (nRef == 0L || nLive == 0L) 0.0
                   else best.toDouble / (nRef.toDouble * nLive.toDouble)
          Iterator.single(DriftStat(t, nLive, best, ks))
      }
  }

  /** Streaming twin of the q200 CUSUM change-point monitor — but ONLINE:
    * q200 is retrospective (the statistic needs the series total, so the
    * answer exists only after the fact); the streaming form is the
    * Page (1954) one-sided pair against a FIXED reference rate learned
    * from a calibration period ([[referenceRate]]), which is how a
    * production volume monitor actually runs. Same exact-integer trick
    * as q200/q203: scale everything by the reference day-count n so
    * deviation = cnt·n − Σref, slack and threshold scale once — no FP in
    * state, so stream == batch-fold equality is EXACT across any
    * micro-batch slicing.
    *
    * State per event type is two longs (the one-sided sums) — O(types),
    * no watermark needed. Input is the per-window count stream an
    * upstream tumbling aggregation produces; within one type, windows
    * are folded in day order per micro-batch (same in-order-delivery
    * contract as [[streamingSessionize]], spec-pinned). */
  final case class DayCount(event_type: String, day_idx: Long, cnt: Long)
  /** `calibrated = false` marks a DEAD-LETTER row: the type arrived with
    * no calibration reference, so no statistic exists — `alarm` rides
    * true (an unmonitorable type IS an operational incident and must
    * page) but s_pos/s_neg are zero, not a fake statistic. */
  final case class CusumStat(
      event_type: String, day_idx: Long, s_pos: Long, s_neg: Long, alarm: Boolean,
      calibrated: Boolean = true)

  /** Per-type (Σcnt, n) over a calibration batch frame: the reference
    * rate the monitor scales against. Bounded by the type vocabulary. */
  def referenceRate(df: DataFrame, typeCol: String, cntCol: String): Map[String, (Long, Long)] =
    df.groupBy(col(typeCol).as("t"))
      .agg(sum(col(cntCol)).cast("long").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  def streamingCusum(
      spark: SparkSession, counts: Dataset[DayCount],
      reference: Map[String, (Long, Long)],
      slack: Double = 0.0, threshold: Double = 5.0): Dataset[CusumStat] = {
    import spark.implicits._
    counts
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (t: String, batch: Iterator[DayCount], state: GroupState[(Long, Long)]) =>
          // an uncalibrated type must not be monitored against a zero
          // reference (its deviation would equal its raw count and alarm
          // with meaningless scaling) — but it must not kill the QUERY
          // either: a require here throws in a task and takes down drift
          // monitoring for every calibrated type too (one novel type in
          // production event data = total blast radius). Instead each of
          // its rows becomes a DEAD-LETTER alarm (calibrated = false),
          // its state stays untouched, and the calibrated types keep
          // monitoring; recalibrate and restart to adopt the type.
          if (!reference.contains(t)) {
            batch.map(e => CusumStat(t, e.day_idx, 0L, 0L, alarm = true,
              calibrated = false))
          } else {
          val (refSum, refN) = reference(t)
          val slackScaled = math.round(slack * refN)
          val hScaled = math.round(threshold * refN)
          var (sp, sn) = state.getOption.getOrElse((0L, 0L))
          val out = batch.toSeq.sortBy(_.day_idx).map { e =>
            val dev = e.cnt * refN - refSum
            sp = math.max(0L, sp + dev - slackScaled)
            sn = math.max(0L, sn - dev - slackScaled)
            CusumStat(t, e.day_idx, sp, sn, sp > hScaled || sn > hScaled)
          }
          state.update((sp, sn))
          out.iterator
          }
      }
  }

  /** Streaming twin of [[graft.ops.Contingency.srm]] — the
    * sample-ratio-mismatch monitor run CONTINUOUSLY: per tumbling
    * window, the chi-square goodness-of-fit of observed arm counts
    * against the declared allocation, with the Wilson-Hilferty
    * upper-tail p and the platform-standard p < 0.001 alarm. An SRM
    * caught a window after the randomizer breaks is a bug contained; an
    * SRM caught at readout time is a week of corrupted metrics.
    *
    * Scale shape: ONE stateful windowed aggregation — the declared arm
    * list is fixed at declaration, so each arm is a CONDITIONAL COUNTER
    * column (whole-stage-codegen sums, no per-arm state growth), state
    * is one row per open window, and the watermark closes it. The
    * chi-square/p arithmetic is plain column math on the closed row.
    *
    * An UNDECLARED arm cannot refuse mid-stream (a task-side require
    * would take down monitoring for every declared arm — the
    * [[streamingCusum]] dead-letter reasoning): it lands in
    * `undeclared_n`, FORCES the alarm, and the declared-arm statistic
    * stays honest (computed over declared counts only). A window with
    * no declared-arm rows emits null chi2/p (no statistic exists) with
    * the alarm riding on `undeclared_n`. */
  def streamingSrm(
      events: DataFrame, armCol: String, tsCol: String,
      expected: Seq[(String, Double)],
      windowLen: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    require(expected.size >= 2, "streamingSrm needs at least two declared arms")
    require(math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      s"declared ratios must sum to 1, got ${expected.map(_._2).sum}")
    require(expected.forall(_._2 > 0.0), "declared ratios must be positive")
    val arm = col(armCol).cast("string")
    val obsCols = expected.zipWithIndex.map { case ((a, _), i) =>
      sum(when(arm === a, 1L).otherwise(0L)).as(s"obs_$i")
    }
    val und = sum(when(!arm.isin(expected.map(_._1): _*), 1L).otherwise(0L))
      .as("undeclared_n")
    val agg = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(obsCols.head, (obsCols.tail :+ und): _*)
    val n = expected.indices.map(i => col(s"obs_$i")).reduce(_ + _)
    val chi2Raw = expected.zipWithIndex.map { case ((_, r), i) =>
      val e = n.cast("double") * lit(r)
      (col(s"obs_$i") - e) * (col(s"obs_$i") - e) / e
    }.reduce(_ + _)
    val chi2 = when(n > 0, chi2Raw)
    val p = when(n > 0,
      graft.ops.Contingency.chi2UpperP(chi2Raw, lit((expected.size - 1).toDouble)))
    agg.select(
      col("window.start").as("w_start"), col("window.end").as("w_end"),
      n.as("n"), col("undeclared_n"),
      chi2.as("chi2"), p.as("p_srm"),
      (coalesce(p < 0.001, lit(false)) || col("undeclared_n") > 0).as("srm"))
  }

  /** Continuous EXPERIMENT SCORECARD: per closed tumbling window, the
    * two-arm readout a platform dashboard shows — arm/conversion counts,
    * lift with its large-sample SE and z, and the SRM integrity check —
    * appended EXACTLY-ONCE to a versioned table (the
    * (writerId, batchId) txn gate absorbs foreachBatch replays, same as
    * [[startExactlyOnceVersionedSink]]). The windowed aggregation is the
    * [[streamingSrm]] shape: declared arms are fixed CONDITIONAL COUNTER
    * columns (codegen sums, one state row per open window, watermark
    * closes it); the scorecard arithmetic is plain column math on the
    * closed row. Undeclared arms dead-letter into `undeclared_n` and
    * force the alarm; a window missing an arm lands with null
    * lift/se/z (no contrast exists) rather than being dropped — the
    * GAP is information. Downstream, the table is time-travelable
    * history of the experiment (q238-style drift reads apply).
    *
    * The iid sink also folds the ALWAYS-VALID companion at commit time
    * ([[alwaysValidFold]]): cumulative counts + mixture-SPRT
    * p_always_valid (and, with `preCovariate`, the CUPED-adjusted
    * p_always_valid_cuped from cumulative moments) — `alwaysValidTau`
    * is the mixture scale for both (the adjusted lift is still a
    * conversion-rate difference). The per-window z columns are
    * fixed-horizon statistics; anyone reading the table continuously
    * should act on the always-valid columns instead. */
  def startExperimentScorecardSink(
      events: DataFrame, armCol: String, convCol: String, tsCol: String,
      focal: String, control: String, focalShare: Double,
      tablePath: String, writerId: String, checkpointDir: String,
      windowLen: String = "1 hour", watermark: String = "10 minutes",
      preCovariate: Option[(DataFrame, String, String)] = None,
      clusterCol: Option[String] = None,
      alwaysValidTau: Double = 0.1): StreamingQuery = {
    clusterCol match {
      case None =>
        val scorecard = experimentScorecard(
          events, armCol, convCol, tsCol, focal, control, focalShare,
          windowLen, watermark, preCovariate, None)
        scorecard.writeStream
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", checkpointDir)
          .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
            val out = alwaysValidFold(batch.toDF(), tablePath, alwaysValidTau)
            graft.io.VersionedTable.commitStreamBatch(
              out, tablePath, writerId, batchId)
            ()
          }
          .start()
      case Some(cl) =>
        // CLUSTERED: the stream runs only the (window, cluster) stateful
        // aggregation; the window fold moves into the sink
        // ([[clusteredFold]], identical arithmetic by call) so the
        // closed per-cluster rows are visible at commit time — that is
        // what lets the CLUSTER LEDGER (a second versioned table at
        // `<tablePath>_clusters`, committed under the same
        // (writerId, batchId) gate) cumulate cluster sums ACROSS
        // windows, closing the r17-declared sequential gap: the honest
        // mSPRT for a cluster-randomized experiment needs cumulative
        // CLUSTER-level variance, and cluster sums span windows so they
        // cannot fold from window rows alone. Scorecard commits FIRST,
        // ledger second: a replay after a partial failure recomputes
        // the fold against the still-prior ledger, and each table's
        // txn gate absorbs what it already has.
        val perCluster = clusteredPerCluster(
          events, armCol, convCol, tsCol, focal, control,
          windowLen, watermark, preCovariate, cl)
        perCluster.writeStream
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", checkpointDir)
          .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
            val pc = batch.toDF()
            val windowRows = clusteredFold(pc, focalShare)
            val (out, newLedger) = alwaysValidFoldClustered(
              windowRows, pc, tablePath, alwaysValidTau)
            graft.io.VersionedTable.commitStreamBatch(
              out, tablePath, writerId, batchId)
            newLedger.foreach { led =>
              graft.io.VersionedTable.commitOverwriteBatch(
                led, s"${tablePath}_clusters", writerId, batchId)
            }
            ()
          }
          .start()
    }
  }

  /** STREAMING A/B/n scorecard — [[startExperimentScorecardSink]]'s
    * k-arm sibling: one stateful (window, arm) moment aggregation
    * (state O(windows × arms), never O(rows)), and at COMMIT time the
    * sink folds cumulative per-arm moments across the table's whole
    * history (an ARM LEDGER at `<tablePath>_arms`, one row per arm,
    * committed under the same (writerId, batchId) txn gate — the
    * cluster-ledger discipline) and emits, per closed window, exactly
    * [[graft.ops.MultiArm.sequential]]'s readout: per-contrast mixture
    * SPRT over the cumulative moments, nonincreasing always-valid p,
    * and Benjamini-Hochberg per look over those p's (e-BH — FDR-valid
    * at ANY look). The contrast arithmetic and the BH tail are
    * `MultiArm`'s own code BY CALL ([[graft.ops.MultiArm.contrastStats]]
    * / [[graft.ops.MultiArm.bhPerLook]]); only the run-max policy
    * differs (prior max from the ledger instead of in-frame history),
    * so streaming == batch on every window prefix is a property of
    * shared code (spec-pinned).
    *
    * Dead letters: a null arm cannot be refused retroactively in a
    * stream — null-arm events are excluded from inference and counted
    * per window in `null_arm_n`. More than 64 arms refuses BY NAME at
    * commit time (fails the query — a segmentation-grade arm column is
    * a wiring bug, not data). `expectedShares` (full per-arm map)
    * adds a per-window k-arm SRM chi-square (df = k−1) beside the
    * readout. CUPED: `preCovariate` streams the x-moments; a ledger
    * committed before the covariate was declared stays x-less and the
    * adjusted leg reads null (a zero-defaulted Σx would silently bend
    * θ — declared inconsistency beats a quietly wrong adjustment).
    *
    * CLUSTER-randomized variant (`clusterCol`): the stateful key
    * becomes (window, cluster, arm) — still design-sized, a pure
    * cluster carries one arm — and the sink folds CLUSTER ledgers
    * instead: per-(cluster, arm) cumulative sums + FIRST-TOUCH window
    * at `<tablePath>_clusters`, arm look-state at `<tablePath>_arms`.
    * Each closed window re-derives [[graft.ops.MultiArm
    * .sequentialClustered]]'s exact readout (first-touch attribution, a
    * second arm's touch excludes the cluster forever and counts it in
    * `mixed_m`, cluster-mean moments, mSPRT + per-look BH) — streaming
    * == batch on every window prefix including invasions that CROSS
    * micro-batches, because first-touch windows fold by min and every
    * statistic is a pure function of the folded sums (spec-pinned). */
  def startMultiArmScorecardSink(
      events: DataFrame, armCol: String, convCol: String, tsCol: String,
      control: String, tablePath: String, writerId: String,
      checkpointDir: String, windowLen: String = "1 hour",
      watermark: String = "10 minutes", tau: Double = 0.1,
      fdr: Double = 0.05, minPerArm: Long = 2L,
      preCovariate: Option[(DataFrame, String, String)] = None,
      expectedShares: Option[Map[String, Double]] = None,
      clusterCol: Option[String] = None): StreamingQuery = {
    require(tau > 0, s"tau must be positive (the mixture scale), got $tau")
    require(fdr > 0 && fdr < 1, s"fdr must be in (0,1), got $fdr")
    expectedShares.foreach { sh =>
      require(sh.nonEmpty && math.abs(sh.values.sum - 1.0) < 1e-9,
        s"expectedShares must sum to 1, got ${sh.values.sum}")
    }
    clusterCol match {
      case None =>
        val perArm = multiArmPerArm(
          events, armCol, convCol, tsCol, windowLen, watermark, preCovariate)
        perArm.writeStream
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", checkpointDir)
          .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
            val (out, newLedger) = multiArmFold(
              batch.toDF(), tablePath, control, tau, fdr, minPerArm,
              expectedShares)
            graft.io.VersionedTable.commitStreamBatch(
              out, tablePath, writerId, batchId)
            newLedger.foreach { led =>
              graft.io.VersionedTable.commitOverwriteBatch(
                led, s"${tablePath}_arms", writerId, batchId)
            }
            ()
          }
          .start()
      case Some(cc) =>
        val perCl = multiArmPerCluster(
          events, armCol, convCol, tsCol, cc, windowLen, watermark,
          preCovariate)
        perCl.writeStream
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", checkpointDir)
          .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
            val (out, newClusters, newArms) = multiArmClusterFold(
              batch.toDF(), tablePath, control, tau, fdr, minPerArm,
              expectedShares)
            graft.io.VersionedTable.commitStreamBatch(
              out, tablePath, writerId, batchId)
            newClusters.foreach { led =>
              graft.io.VersionedTable.commitOverwriteBatch(
                led, s"${tablePath}_clusters", writerId, batchId)
            }
            newArms.foreach { led =>
              graft.io.VersionedTable.commitOverwriteBatch(
                led, s"${tablePath}_arms", writerId, batchId)
            }
            ()
          }
          .start()
    }
  }

  /** The k-arm scorecard's ONE stateful operator: (window, arm) keyed
    * moments — counts, Σy, Σy² (+ Σx, Σx², Σxy with `preCovariate`).
    * Everything downstream is sink-side batch math over design-sized
    * frames. */
  private[graft] def multiArmPerArm(
      events: DataFrame, armCol: String, convCol: String, tsCol: String,
      windowLen: String, watermark: String,
      preCovariate: Option[(DataFrame, String, String)]): DataFrame = {
    val arm = col(armCol).cast("string")
    val y = col(convCol).cast("double")
    val src = preCovariate match {
      case None => events
      case Some((dim, subjectCol, xCol)) =>
        events.join(
          broadcast(dim.select(col(subjectCol),
            col(xCol).cast("double").as("__graft_x"))),
          Seq(subjectCol), "left")
          .withColumn("__graft_x", coalesce(col("__graft_x"), lit(0.0)))
    }
    val x = col("__graft_x")
    val xAggs =
      if (preCovariate.isEmpty) Seq.empty
      else Seq(sum(x).as("svx"), sum(x * x).as("svxx"), sum(x * y).as("svxy"))
    val aggs = Seq(
      sum(lit(1L)).as("en"), sum(y).as("sv"), sum(y * y).as("svv")) ++ xAggs
    src.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), arm.as("arm"))
      .agg(aggs.head, aggs.tail: _*)
      .select(Seq(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("arm"),
        col("en"), col("sv"), col("svv")) ++
        (if (preCovariate.isEmpty) Seq.empty
         else Seq(col("svx"), col("svxx"), col("svxy"))): _*)
  }

  /** The always-valid k-arm fold — cumulative per-arm moments (prior
    * ledger + this batch's closed windows), then [[graft.ops.MultiArm]]'s
    * contrast/BH tail by call with the cross-batch run-max spliced in.
    * Returns (scorecard rows, Some(new arm-ledger snapshot)) — None for
    * the ledger when the batch closed no windows, so an idle micro-batch
    * cannot overwrite state it did not read. */
  private[graft] def multiArmFold(
      batch: DataFrame, tablePath: String, control: String, tau: Double,
      fdr: Double, minPerArm: Long,
      expectedShares: Option[Map[String, Double]]): (DataFrame, Option[DataFrame]) = {
    val spark = batch.sparkSession
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ledgerPath = s"${tablePath}_arms"
    val hasCuped = batch.columns.contains("svx")
    val nullArm = batch.filter(col("arm").isNull)
      .groupBy(col("w_start")).agg(sum("en").as("null_arm_n"))
    val data0 = batch.filter(col("arm").isNotNull)
    val data =
      if (hasCuped) data0
      else data0.withColumn("svx", lit(0.0))
        .withColumn("svxx", lit(0.0)).withColumn("svxy", lit(0.0))
    val (priorLedger: DataFrame, priorHasX: Boolean) =
      if (graft.io.VersionedTable.versions(spark, ledgerPath).isEmpty)
        (Seq.empty[(String, Long, Double, Double, Double, Double, Double, Long, Double)]
          .toDF("arm", "n", "s", "ss", "sx", "sxx", "sxy", "k", "max_ll")
          .withColumn("max_ll_cuped", lit(null).cast("double")), true)
      else {
        val led = graft.io.VersionedTable.read(spark, ledgerPath)
        val hasX = led.columns.contains("sx")
        val base = led.select(
          Seq(col("arm"), col("n"), col("s"), col("ss")) ++
          (if (hasX) Seq(col("sx"), col("sxx"), col("sxy"))
           else Seq(lit(0.0).as("sx"), lit(0.0).as("sxx"),
             lit(0.0).as("sxy"))) ++
          Seq(col("k"), col("max_ll"),
            if (led.columns.contains("max_ll_cuped")) col("max_ll_cuped")
            else lit(null).cast("double").as("max_ll_cuped")): _*)
        (base, hasX)
      }
    val cupedActive = hasCuped && priorHasX
    // arm census from one bounded probe over prior ∪ batch — the
    // MultiArm level-cap refusal, by name, at commit time
    val armVals = priorLedger.select("arm").union(data.select("arm"))
      .distinct().limit(66).collect().map(_.getString(0)).toSeq
    require(armVals.length <= 64,
      "arm column has more than 64 levels — that is a segmentation, " +
        "not an experiment (check the column)")
    expectedShares.foreach { sh =>
      val missing = armVals.filterNot(sh.contains)
      require(missing.isEmpty,
        s"expectedShares missing arm(s): ${missing.sorted.mkString(", ")}")
    }
    // windows from the WHOLE batch (a window holding only dead-letter
    // rows is still a look — cumulative state just repeats)
    val windows = batch.select(col("w_start").as("day")).distinct()
    val anyWindow = !windows.isEmpty
    val armsDF = armVals.toDF("arm")
    val prior = priorLedger.select(col("arm"), col("n").as("p_n"),
      col("s").as("p_s"), col("ss").as("p_ss"), col("sx").as("p_sx"),
      col("sxx").as("p_sxx"), col("sxy").as("p_sxy"), col("k").as("p_k"),
      col("max_ll").as("p_max"), col("max_ll_cuped").as("p_max_c"))
    val byArm = W.partitionBy("arm").orderBy("day")
    val cum = windows.crossJoin(broadcast(armsDF)) // windows × ≤64 arms
      .join(data.select(col("w_start").as("day"), col("arm"), col("en"),
        col("sv"), col("svv"), col("svx"), col("svxx"), col("svxy")),
        Seq("day", "arm"), "left")
      .join(prior, Seq("arm"), "left")
      .withColumn("n", coalesce(col("p_n"), lit(0L)) +
        sum(coalesce(col("en"), lit(0L))).over(byArm))
      .withColumn("s", coalesce(col("p_s"), lit(0.0)) +
        sum(coalesce(col("sv"), lit(0.0))).over(byArm))
      .withColumn("ss", coalesce(col("p_ss"), lit(0.0)) +
        sum(coalesce(col("svv"), lit(0.0))).over(byArm))
      .withColumn("sx", coalesce(col("p_sx"), lit(0.0)) +
        sum(coalesce(col("svx"), lit(0.0))).over(byArm))
      .withColumn("sxx", coalesce(col("p_sxx"), lit(0.0)) +
        sum(coalesce(col("svxx"), lit(0.0))).over(byArm))
      .withColumn("sxy", coalesce(col("p_sxy"), lit(0.0)) +
        sum(coalesce(col("svxy"), lit(0.0))).over(byArm))
    val stats = graft.ops.MultiArm.contrastStats(
      cum.select("arm", "day", "n", "s", "ss", "sx", "sxx", "sxy"),
      control, tau, math.max(minPerArm, 2L), cupedActive)
    // cross-batch pieces: k continues the ledger's look count, the
    // run max folds the ledger's prior max (associative, exact)
    val runW = byArm.rowsBetween(W.unboundedPreceding, W.currentRow)
    val withPrior = stats
      .join(prior.select(col("arm"), col("p_k"), col("p_max"),
        col("p_max_c")), Seq("arm"), "left")
      .withColumn("k", col("k") + coalesce(col("p_k"), lit(0L)))
      .withColumn("max_log_lambda",
        greatest(coalesce(col("p_max"), lit(Double.NegativeInfinity)),
          max(col("log_lambda")).over(runW)))
      .withColumn("p_always_valid",
        least(lit(1.0), exp(-col("max_log_lambda"))))
    val scored =
      if (!cupedActive) withPrior
      else withPrior
        .withColumn("max_log_lambda_cuped",
          greatest(coalesce(col("p_max_c"), lit(Double.NegativeInfinity)),
            max(col("log_lambda_cuped")).over(runW)))
        .withColumn("p_always_valid_cuped",
          least(lit(1.0), exp(-col("max_log_lambda_cuped"))))
    val ranked = graft.ops.MultiArm.bhPerLook(scored, fdr, cupedActive)
    // per-window health columns: dead-letter count + k-arm SRM
    val srmPerDay = armSrmPerWindow(windows, armsDF,
      data.select(col("w_start").as("day"), col("arm"), col("en")),
      armVals.length, expectedShares)
    val out0 = ranked.withColumnRenamed("day", "w_start")
      .join(srmPerDay.withColumnRenamed("day", "w_start"),
        Seq("w_start"), "left")
      .join(nullArm, Seq("w_start"), "left")
      .withColumn("null_arm_n", coalesce(col("null_arm_n"), lit(0L)))
    val out =
      if (!hasCuped || cupedActive) out0
      else // pre-upgrade ledger: the adjusted leg is honestly null
        Seq("theta", "delta_cuped", "se_cuped", "log_lambda_cuped",
          "p_always_valid_cuped").foldLeft(out0)((df, c) =>
          df.withColumn(c, lit(null).cast("double")))
    val ledger =
      if (!anyWindow) None
      else {
        val lastFirst = W.partitionBy("arm").orderBy(col("day").desc)
        val lastCum = cum.withColumn("__rn", row_number().over(lastFirst))
          .filter(col("__rn") === 1)
          .select(Seq(col("arm"), col("n"), col("s"), col("ss")) ++
            (if (cupedActive) Seq(col("sx"), col("sxx"), col("sxy"))
             else Seq.empty): _*)
        val lastStat = scored.withColumn("__rn", row_number().over(lastFirst))
          .filter(col("__rn") === 1)
          .select(Seq(col("arm"), col("k").as("k_new"),
            col("max_log_lambda").as("max_new")) ++
            (if (cupedActive)
              Seq(col("max_log_lambda_cuped").as("max_c_new"))
             else Seq.empty): _*)
        val led = lastCum
          .join(lastStat, Seq("arm"), "left")
          .join(prior.select(col("arm"), col("p_k"), col("p_max"),
            col("p_max_c")), Seq("arm"), "left")
          .withColumn("k", coalesce(col("k_new"), col("p_k"), lit(0L)))
          .withColumn("max_ll", coalesce(col("max_new"), col("p_max"),
            lit(Double.NegativeInfinity)))
        Some(
          if (cupedActive)
            led.withColumn("max_ll_cuped",
              coalesce(col("max_c_new"), col("p_max_c"),
                lit(Double.NegativeInfinity)))
              .select("arm", "n", "s", "ss", "sx", "sxx", "sxy", "k",
                "max_ll", "max_ll_cuped")
          else led.select("arm", "n", "s", "ss", "k", "max_ll"))
      }
    (out, ledger)
  }

  /** Per-window k-arm SRM — chi-square over this window's per-arm
    * subject counts against the declared shares (df = k−1,
    * [[graft.ops.Contingency.chi2UpperP]] by call); null columns when
    * no shares are declared. Shared by the iid and clustered k-arm
    * folds. `perWinCounts` = (day, arm, en). */
  private def armSrmPerWindow(
      windows: DataFrame, armsDF: DataFrame, perWinCounts: DataFrame,
      nArms: Int, expectedShares: Option[Map[String, Double]]): DataFrame = {
    val spark = windows.sparkSession
    import spark.implicits._
    expectedShares match {
      case None => windows
        .withColumn("srm_chi2", lit(null).cast("double"))
        .withColumn("p_srm", lit(null).cast("double"))
        .withColumn("srm", lit(false))
      case Some(sh) =>
        val winStats = windows.crossJoin(broadcast(armsDF))
          .join(perWinCounts, Seq("day", "arm"), "left")
          .withColumn("en", coalesce(col("en"), lit(0L)))
        val sharesDF = broadcast(sh.toSeq.toDF("arm", "share"))
        val tot = winStats.groupBy("day").agg(sum("en").as("wn"))
        winStats.join(sharesDF, Seq("arm"), "left")
          .join(tot, "day")
          .withColumn("expn", col("wn").cast("double") * col("share"))
          .groupBy("day").agg(
            sum(when(col("expn") > 0.0,
              (col("en").cast("double") - col("expn")) *
                (col("en").cast("double") - col("expn")) / col("expn"))
              .otherwise(lit(0.0))).as("srm_chi2"),
            max("wn").as("wn"))
          .withColumn("p_srm", when(col("wn") > 0,
            graft.ops.Contingency.chi2UpperP(col("srm_chi2"),
              lit((nArms - 1).toDouble))))
          .withColumn("srm", coalesce(col("p_srm") < 0.001, lit(false)))
          .select(col("day"), col("srm_chi2"), col("p_srm"), col("srm"))
    }
  }

  /** The CLUSTERED k-arm scorecard's ONE stateful operator:
    * (window, cluster, arm) keyed sums — counts, Σy (+ Σx with
    * `preCovariate`). Design-sized: a pure cluster carries one arm, so
    * the key count tracks clusters, not rows. Squares are NOT needed:
    * cluster-level variance comes from the spread of cluster MEANS,
    * computed in the fold. */
  private[graft] def multiArmPerCluster(
      events: DataFrame, armCol: String, convCol: String, tsCol: String,
      clusterCol: String, windowLen: String, watermark: String,
      preCovariate: Option[(DataFrame, String, String)]): DataFrame = {
    val arm = col(armCol).cast("string")
    val y = col(convCol).cast("double")
    val src = preCovariate match {
      case None => events
      case Some((dim, subjectCol, xCol)) =>
        events.join(
          broadcast(dim.select(col(subjectCol),
            col(xCol).cast("double").as("__graft_x"))),
          Seq(subjectCol), "left")
          .withColumn("__graft_x", coalesce(col("__graft_x"), lit(0.0)))
    }
    val x = col("__graft_x")
    val xAggs =
      if (preCovariate.isEmpty) Seq.empty else Seq(sum(x).as("sx"))
    val aggs = Seq(sum(lit(1L)).as("en"), sum(y).as("sy")) ++ xAggs
    src.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        col(clusterCol).cast("string").as("cluster"), arm.as("arm"))
      .agg(aggs.head, aggs.tail: _*)
      .select(Seq(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("cluster"), col("arm"),
        col("en"), col("sy")) ++
        (if (preCovariate.isEmpty) Seq.empty else Seq(col("sx"))): _*)
  }

  /** The always-valid CLUSTERED k-arm fold — the streaming twin of
    * [[graft.ops.MultiArm.sequentialClustered]], rebuilt at each commit
    * from two ledgers: per-(cluster, arm) cumulative sums + first-touch
    * window (`<tablePath>_clusters`) and per-arm look state
    * (`<tablePath>_arms`). First-touch attribution folds exactly (min
    * is associative; a second arm's touch in ANY batch excludes the
    * cluster from that window on), cluster means come from the folded
    * sums, and the contrast/BH tail is [[graft.ops.MultiArm]]'s code by
    * call — so streaming == batch on every window prefix, including
    * invasions that cross micro-batches. Returns
    * (scorecard rows, cluster-ledger snapshot, arm-ledger snapshot);
    * ledgers are None when the batch closed no windows. */
  private[graft] def multiArmClusterFold(
      batch: DataFrame, tablePath: String, control: String, tau: Double,
      fdr: Double, minClusters: Long,
      expectedShares: Option[Map[String, Double]])
      : (DataFrame, Option[DataFrame], Option[DataFrame]) = {
    val spark = batch.sparkSession
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val clLedgerPath = s"${tablePath}_clusters"
    val armLedgerPath = s"${tablePath}_arms"
    val hasCuped = batch.columns.contains("sx")
    val nullArm = batch.filter(col("arm").isNull)
      .groupBy(col("w_start")).agg(sum("en").as("null_arm_n"))
    val data0 = batch.filter(col("arm").isNotNull)
    val data =
      if (hasCuped) data0 else data0.withColumn("sx", lit(0.0))
    val (priorCl: DataFrame, priorHasX: Boolean) =
      if (graft.io.VersionedTable.versions(spark, clLedgerPath).isEmpty)
        (Seq.empty[(String, String, Long, Double, Double, java.sql.Timestamp)]
          .toDF("cluster", "arm", "n", "sy", "sx", "first_w"), true)
      else {
        val led = graft.io.VersionedTable.read(spark, clLedgerPath)
        val hasX = led.columns.contains("sx")
        (led.select(Seq(col("cluster"), col("arm"), col("n"), col("sy")) ++
          (if (hasX) Seq(col("sx")) else Seq(lit(0.0).as("sx"))) ++
          Seq(col("first_w")): _*), hasX)
      }
    val cupedActive = hasCuped && priorHasX
    val priorArm: DataFrame =
      if (graft.io.VersionedTable.versions(spark, armLedgerPath).isEmpty)
        Seq.empty[(String, Long, Double)].toDF("arm", "k", "max_ll")
          .withColumn("max_ll_cuped", lit(null).cast("double"))
      else {
        val led = graft.io.VersionedTable.read(spark, armLedgerPath)
        led.select(col("arm"), col("k"), col("max_ll"),
          if (led.columns.contains("max_ll_cuped")) col("max_ll_cuped")
          else lit(null).cast("double").as("max_ll_cuped"))
      }
    val armVals = priorCl.select("arm").union(data.select("arm"))
      .distinct().limit(66).collect().map(_.getString(0)).toSeq
    require(armVals.length <= 64,
      "arm column has more than 64 levels — that is a segmentation, " +
        "not an experiment (check the column)")
    expectedShares.foreach { sh =>
      val missing = armVals.filterNot(sh.contains)
      require(missing.isEmpty,
        s"expectedShares missing arm(s): ${missing.sorted.mkString(", ")}")
    }
    val windows = batch.select(col("w_start").as("day")).distinct()
    val anyWindow = !windows.isEmpty
    // the (cluster, arm) universe: design-sized (pure clusters carry
    // one arm), folded across ledger ∪ batch
    val pairs = priorCl.select("cluster", "arm")
      .union(data.select("cluster", "arm")).distinct()
    val byPair = W.partitionBy("cluster", "arm").orderBy("day")
    val cum = windows.crossJoin(pairs)
      .join(data.select(col("w_start").as("day"), col("cluster"),
        col("arm"), col("en"), col("sy"), col("sx")),
        Seq("day", "cluster", "arm"), "left")
      .join(priorCl.select(col("cluster"), col("arm"), col("n").as("p_n"),
        col("sy").as("p_sy"), col("sx").as("p_sx"),
        col("first_w").as("p_first")), Seq("cluster", "arm"), "left")
      .withColumn("cn", coalesce(col("p_n"), lit(0L)) +
        sum(coalesce(col("en"), lit(0L))).over(byPair))
      .withColumn("csy", coalesce(col("p_sy"), lit(0.0)) +
        sum(coalesce(col("sy"), lit(0.0))).over(byPair))
      .withColumn("csx", coalesce(col("p_sx"), lit(0.0)) +
        sum(coalesce(col("sx"), lit(0.0))).over(byPair))
      .withColumn("first_w", coalesce(col("p_first"),
        min(when(col("en") > 0L, col("day"))).over(byPair)))
    // first-touch attribution AT each window: among this cluster's
    // touched pairs, the (first_w, arm)-least owns it; a touched second
    // pair means the cluster is mixed from here on
    val byClDay = W.partitionBy("cluster", "day")
      .orderBy(col("first_w").asc_nulls_last, col("arm"))
    val att = cum.withColumn("rn", row_number().over(byClDay))
    val mixedAt = att
      .filter(col("rn") === 2 && col("first_w").isNotNull)
      .select(col("cluster"), col("day")).withColumn("mixed", lit(true))
    val own = att.filter(col("rn") === 1 && col("first_w").isNotNull)
      .join(mixedAt, Seq("cluster", "day"), "left")
    val contrib = !coalesce(col("mixed"), lit(false))
    val my = col("csy") / col("cn")
    val mx = col("csx") / col("cn")
    val armDay = own.groupBy(col("day"), col("arm")).agg(
      sum(when(contrib, 1L).otherwise(0L)).as("n"),
      sum(when(contrib, my).otherwise(lit(0.0))).as("s"),
      sum(when(contrib, my * my).otherwise(lit(0.0))).as("ss"),
      sum(when(contrib, mx).otherwise(lit(0.0))).as("sx"),
      sum(when(contrib, mx * mx).otherwise(lit(0.0))).as("sxx"),
      sum(when(contrib, mx * my).otherwise(lit(0.0))).as("sxy"))
    val mixedPerDay = windows
      .join(mixedAt.groupBy("day").agg(count(lit(1)).as("mixed_m")),
        Seq("day"), "left")
      .withColumn("mixed_m", coalesce(col("mixed_m"), lit(0L)))
    val stats = graft.ops.MultiArm.contrastStats(
      armDay, control, tau, math.max(minClusters, 2L), cupedActive)
    val prior = priorArm.select(col("arm"), col("k").as("p_k"),
      col("max_ll").as("p_max"), col("max_ll_cuped").as("p_max_c"))
    val byArm = W.partitionBy("arm").orderBy("day")
    val runW = byArm.rowsBetween(W.unboundedPreceding, W.currentRow)
    val withPrior = stats
      .join(prior, Seq("arm"), "left")
      .withColumn("k", col("k") + coalesce(col("p_k"), lit(0L)))
      .withColumn("max_log_lambda",
        greatest(coalesce(col("p_max"), lit(Double.NegativeInfinity)),
          max(col("log_lambda")).over(runW)))
      .withColumn("p_always_valid",
        least(lit(1.0), exp(-col("max_log_lambda"))))
    val scored =
      if (!cupedActive) withPrior
      else withPrior
        .withColumn("max_log_lambda_cuped",
          greatest(coalesce(col("p_max_c"), lit(Double.NegativeInfinity)),
            max(col("log_lambda_cuped")).over(runW)))
        .withColumn("p_always_valid_cuped",
          least(lit(1.0), exp(-col("max_log_lambda_cuped"))))
    val ranked = graft.ops.MultiArm.bhPerLook(scored, fdr, cupedActive)
    val armsDF = armVals.toDF("arm")
    val srmPerDay = armSrmPerWindow(windows, armsDF,
      data.groupBy(col("w_start").as("day"), col("arm"))
        .agg(sum("en").as("en")),
      armVals.length, expectedShares)
    val out0 = ranked.withColumnRenamed("day", "w_start")
      .join(mixedPerDay.withColumnRenamed("day", "w_start"),
        Seq("w_start"), "left")
      .join(srmPerDay.withColumnRenamed("day", "w_start"),
        Seq("w_start"), "left")
      .join(nullArm, Seq("w_start"), "left")
      .withColumn("null_arm_n", coalesce(col("null_arm_n"), lit(0L)))
    val out =
      if (!hasCuped || cupedActive) out0
      else Seq("theta", "delta_cuped", "se_cuped", "log_lambda_cuped",
        "p_always_valid_cuped").foldLeft(out0)((df, c) =>
        df.withColumn(c, lit(null).cast("double")))
    val (clusterLedger, armLedger) =
      if (!anyWindow) (None, None)
      else {
        val lastFirst = W.partitionBy("cluster", "arm").orderBy(col("day").desc)
        val lastCum = cum.withColumn("__rn", row_number().over(lastFirst))
          .filter(col("__rn") === 1)
          .select(Seq(col("cluster"), col("arm"), col("cn").as("n"),
            col("csy").as("sy")) ++
            (if (cupedActive) Seq(col("csx").as("sx")) else Seq.empty) ++
            Seq(col("first_w")): _*)
        val lastArm = W.partitionBy("arm").orderBy(col("day").desc)
        val lastStat = scored.withColumn("__rn", row_number().over(lastArm))
          .filter(col("__rn") === 1)
          .select(Seq(col("arm"), col("k").as("k_new"),
            col("max_log_lambda").as("max_new")) ++
            (if (cupedActive)
              Seq(col("max_log_lambda_cuped").as("max_c_new"))
             else Seq.empty): _*)
        val armLed0 = armsDF
          .join(lastStat, Seq("arm"), "left")
          .join(prior, Seq("arm"), "left")
          .withColumn("k", coalesce(col("k_new"), col("p_k"), lit(0L)))
          .withColumn("max_ll", coalesce(col("max_new"), col("p_max"),
            lit(Double.NegativeInfinity)))
        val armLed =
          if (cupedActive)
            armLed0.withColumn("max_ll_cuped",
              coalesce(col("max_c_new"), col("p_max_c"),
                lit(Double.NegativeInfinity)))
              .select("arm", "k", "max_ll", "max_ll_cuped")
          else armLed0.select("arm", "k", "max_ll")
        (Some(lastCum), Some(armLed))
      }
    (out, clusterLedger, armLedger)
  }

  /** The ALWAYS-VALID column fold for the scorecard sink (VERDICT r16
    * item 4): the per-window z at :838 is a fixed-horizon statistic — a
    * monitor reading it every window is the textbook peeking protocol.
    * This fold appends the honest companion at COMMIT time: cumulative
    * arm counts to date, the mixture-SPRT ln Λ on those cumulative
    * counts (arithmetic = [[graft.ops.SequentialTest.alwaysValidP]],
    * called, not copied), and p_always_valid = min(1, e^{−max ln Λ}) —
    * nonincreasing across the table's whole history, valid under
    * continuous monitoring.
    *
    * WHY sink-side: a running prefix across closed windows is not a
    * windowed aggregation (no window key), so it cannot ride the
    * streaming state store in append mode; but the sink already owns a
    * deterministic, exactly-once serialization of closed windows — the
    * watermark closes them in event-time order and the (writerId,
    * batchId) txn gate absorbs replays, so "prior cumulative state" is
    * simply the LAST committed row, an O(1) read of a windows-sized
    * table. The batch's own windows fold through one calendar-bounded
    * window pass. Streaming output == batch [[graft.ops.SequentialTest.
    * alwaysValidP]] on every window prefix (running max is associative;
    * the counts are exact longs) — spec-pinned to bitwise, incl. forced
    * replay.
    *
    * CUPED leg: when the scorecard carries the per-window moment sums
    * (preCovariate set), the fold also cumulates them and reads the
    * cumulative-to-date adjusted lift through the SAME closed form as
    * the per-window columns ([[cupedWindowCols]] on `cum_*`) — exactly
    * batch [[graft.ops.Cuped.cuped]] on the prefix — then applies the
    * normal-mean mixture SPRT ([[graft.ops.SequentialTest
    * .alwaysValidPMean]]'s arithmetic) for `p_always_valid_cuped`: the
    * variance-reduced monitor that stays honest under peeking. The
    * CLUSTERED scorecard keeps its declared gap (an honest sequential
    * readout there needs cumulative CLUSTER-level variance — cluster
    * sums span windows, so they cannot fold from window rows). */
  private[graft] def alwaysValidFold(
      batch: DataFrame, tablePath: String, tau: Double): DataFrame = {
    val spark = batch.sparkSession
    // the CUPED leg rides only when the scorecard carries the moment
    // columns (preCovariate set): cumulative moments are the associative
    // facts, so the cumulative-to-date theta/lift/SE are EXACTLY batch
    // Cuped.cuped on the prefix — per-window thetas never fold
    val hasCuped = batch.columns.contains("sx_f")
    val momentNames = Seq("sx_f", "sxx_f", "sxy_f", "syy_f",
      "sx_c", "sxx_c", "sxy_c", "syy_c")
    val longNames = Seq("n_f", "conv_f", "n_c", "conv_c")
    // prior cumulative state: the last committed window's row (zeros
    // before the first commit)
    val priorCols = longNames.map("cum_" + _) ++ Seq("max_log_lambda") ++
      (if (hasCuped) momentNames.map("cum_" + _) :+ "max_log_lambda_cuped"
       else Seq.empty)
    // select only the prior columns the table ACTUALLY has: a scorecard
    // committed before this fold existed (or before a preCovariate flip
    // turned hasCuped on) lacks some cum_* columns — those legs restart
    // from zero/−Inf state rather than killing the query's first
    // post-upgrade micro-batch with an AnalysisException
    val priorRow: Option[org.apache.spark.sql.Row] =
      if (graft.io.VersionedTable.versions(spark, tablePath).isEmpty) None
      else {
        val tbl = graft.io.VersionedTable.read(spark, tablePath)
        val present = priorCols.filter(tbl.columns.contains)
        if (present.isEmpty) None
        else tbl.orderBy(col("w_start").desc).limit(1)
          .select(present.map(col): _*)
          .collect().headOption
      }
    def priorOpt[T](n: String): Option[T] = priorRow.flatMap { r =>
      if (!r.schema.fieldNames.contains(n) || r.isNullAt(r.fieldIndex(n))) None
      else Some(r.getAs[T](n))
    }
    def priorLong(n: String): Long = priorOpt[Long]("cum_" + n).getOrElse(0L)
    def priorMoment(n: String): Double = priorOpt[Double]("cum_" + n).getOrElse(0.0)
    def priorMax(n: String): Double =
      priorOpt[Double](n).getOrElse(Double.NegativeInfinity)
    val w = graft.core.Windows.bounded(col("w_start"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val withCum0 = longNames.foldLeft(batch)((df, n) =>
      df.withColumn(s"cum_$n", lit(priorLong(n)) + sum(n).over(w)))
    val withCum =
      if (!hasCuped) withCum0
      else momentNames.foldLeft(withCum0)((df, n) =>
        df.withColumn(s"cum_$n", lit(priorMoment(n)) + sum(n).over(w)))
    // the mixture-SPRT arithmetic, by CALL (drift-proof): alwaysValidP
    // reads (day, n_a, conv_a, n_b, conv_b) and emits log_lambda + its
    // in-frame running-min p; the cross-batch running max then folds the
    // prior state in (associative, exact) and p recomputes from it
    val monitorShaped = withCum
      .withColumn("day", col("w_start"))
      .withColumn("n_a", col("cum_n_f"))
      .withColumn("conv_a", col("cum_conv_f"))
      .withColumn("n_b", col("cum_n_c"))
      .withColumn("conv_b", col("cum_conv_c"))
    val conversions = graft.ops.SequentialTest.alwaysValidP(monitorShaped, tau)
      .withColumn("max_log_lambda",
        greatest(lit(priorMax("max_log_lambda")), max(col("log_lambda")).over(w)))
      .withColumn("p_always_valid",
        least(lit(1.0), exp(-col("max_log_lambda"))))
      .drop("day", "n_a", "conv_a", "n_b", "conv_b")
    if (!hasCuped) conversions
    else {
      // cumulative CUPED readout through the SAME closed form as the
      // per-window columns (by call), then the normal-mean mixture SPRT
      // with the adjusted lift in Δ's seat and its Welch variance in V's
      // — [[graft.ops.SequentialTest.alwaysValidPMean]]'s arithmetic on
      // the adjusted metric. τ shares the conversion scale: the adjusted
      // lift IS a conversion-rate difference.
      val (thetaCum, liftCum, seCum, _) = cupedWindowCols(n => col(s"cum_$n"))
      val ready = col("cum_n_f") >= 2 && col("cum_n_c") >= 2
      val v = seCum * seCum
      val t2 = lit(tau * tau)
      val lnl = when(ready && v > 0.0,
        lit(0.5) * log(v / (v + t2)) +
          liftCum * liftCum * t2 / (lit(2.0) * v * (v + t2)))
        .otherwise(lit(0.0))
      conversions
        .withColumn("theta_cum", when(ready, thetaCum))
        .withColumn("lift_cuped_cum", when(ready, liftCum))
        .withColumn("se_cuped_cum", when(ready, seCum))
        .withColumn("log_lambda_cuped", lnl)
        .withColumn("max_log_lambda_cuped",
          greatest(lit(priorMax("max_log_lambda_cuped")),
            max(col("log_lambda_cuped")).over(w)))
        .withColumn("p_always_valid_cuped",
          least(lit(1.0), exp(-col("max_log_lambda_cuped"))))
    }
  }

  /** The ALWAYS-VALID fold for the CLUSTERED scorecard (closing the
    * r17-declared gap): honest sequential inference for a
    * cluster-randomized experiment needs cumulative CLUSTER-level
    * variance, and cluster sums span windows — so the sink persists a
    * CLUSTER LEDGER (per-cluster cumulative (n, Σy) per arm side, one
    * row per cluster — state O(clusters), the same design-sized bound
    * the streaming state already carries) beside the window rows, and
    * at each commit rebuilds the per-window-prefix cluster picture:
    * prior ledger + this batch's closed per-cluster rows, cumulated
    * over the batch's windows on a clusters × windows grid.
    *
    * The statistic is the cluster-level normal-mean mSPRT — Δ = the
    * difference of unweighted cluster-mean averages, V = the sample
    * variance of cluster means over clusters — with "which clusters
    * count" (pure-arm only; cumulatively-mixed excluded and counted)
    * decided by [[graft.ops.SequentialTest.clusterLookStats]] and ln Λ
    * by [[graft.ops.SequentialTest.meanLogLambda]], both BY CALL: the
    * identical arithmetic behind the batch monitor
    * ([[graft.ops.SequentialTest.clusterMeanMonitor]] +
    * `alwaysValidPMean`), so streaming == batch on every window prefix
    * is a property of shared code, not parallel implementations
    * (spec-pinned, incl. forced replay). Windows too thin for a
    * cluster-level sample variance (< 2 pure clusters a side) carry
    * ln Λ = 0 — no evidence either way; p saturates at 1 exactly where
    * the batch monitor has no qualifying row.
    *
    * Returns (window rows + cluster columns, Some(new ledger snapshot))
    * — or None for the ledger when the batch closed no windows, so an
    * idle micro-batch cannot overwrite state it did not read. */
  private[graft] def alwaysValidFoldClustered(
      windowRows: DataFrame, perCluster: DataFrame, tablePath: String,
      tau: Double): (DataFrame, Option[DataFrame]) = {
    val spark = windowRows.sparkSession
    import spark.implicits._
    val ledgerPath = s"${tablePath}_clusters"
    // the CUPED leg rides when the stream carries the per-cluster
    // covariate sums (preCovariate set): the ledger then also cumulates
    // per-cluster Σx per side, and the fold runs the CLUSTER-level
    // CUPED mSPRT beside the raw one
    val hasCuped = perCluster.columns.contains("sxf")
    val xDaily =
      if (!hasCuped) Seq.empty
      else Seq(col("sxf").cast("double").as("dsx_f"),
        col("sxc").cast("double").as("dsx_c"))
    val daily = perCluster.select(Seq(
      col("window.start").as("day"), col("__cl").as("cluster"),
      col("nf").cast("long").as("dn_f"), col("syf").cast("double").as("dsy_f"),
      col("nc").cast("long").as("dn_c"), col("syc").cast("double").as("dsy_c"))
      ++ xDaily: _*)
    val windows = daily.select("day").distinct()
    val anyWindow = !windows.isEmpty
    val (priorLedger: DataFrame, priorHasX: Boolean) =
      if (graft.io.VersionedTable.versions(spark, ledgerPath).isEmpty)
        (Seq.empty[(String, Long, Double, Long, Double, Double, Double)]
          .toDF("cluster", "n_f", "sy_f", "n_c", "sy_c", "sx_f", "sx_c"),
          true)
      else {
        val led = graft.io.VersionedTable.read(spark, ledgerPath)
        // pre-CUPED-upgrade ledgers lack the x sums: the raw leg keeps
        // folding, the CUPED cluster leg goes NULL (a zero-defaulted x
        // sum would silently bend θ — declared inconsistency beats a
        // quietly wrong adjustment)
        val hasX = led.columns.contains("sx_f")
        val base = led.select(Seq(col("cluster"), col("n_f"), col("sy_f"),
          col("n_c"), col("sy_c")) ++
          (if (hasX) Seq(col("sx_f"), col("sx_c"))
           else Seq(lit(0.0).as("sx_f"), lit(0.0).as("sx_c"))): _*)
        (base, hasX)
      }
    // prior running max from the last committed scorecard row (absent
    // column / pre-upgrade table → fresh −Inf state, the iid policy)
    def priorMaxOf(colName: String): Double = {
      if (graft.io.VersionedTable.versions(spark, tablePath).isEmpty)
        Double.NegativeInfinity
      else {
        val tbl = graft.io.VersionedTable.read(spark, tablePath)
        if (!tbl.columns.contains(colName)) Double.NegativeInfinity
        else tbl.orderBy(col("w_start").desc).limit(1)
          .select(colName).collect().headOption
          .filterNot(_.isNullAt(0)).map(_.getDouble(0))
          .getOrElse(Double.NegativeInfinity)
      }
    }
    val priorMax: Double = priorMaxOf("max_log_lambda_cluster")
    val priorMaxCuped: Double =
      if (!hasCuped) Double.NegativeInfinity
      else priorMaxOf("max_log_lambda_cluster_cuped")
    val clusters = priorLedger.select("cluster")
      .union(daily.select("cluster")).distinct()
    val byCl = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster").orderBy("day")
    val cum0 = clusters.crossJoin(windows) // design-sized × windows-in-batch
      .join(daily, Seq("cluster", "day"), "left")
      .join(priorLedger.select(col("cluster"), col("n_f").as("b_n_f"),
        col("sy_f").as("b_sy_f"), col("n_c").as("b_n_c"),
        col("sy_c").as("b_sy_c"), col("sx_f").as("b_sx_f"),
        col("sx_c").as("b_sx_c")), Seq("cluster"), "left")
      .withColumn("n_f", coalesce(col("b_n_f"), lit(0L)) +
        sum(coalesce(col("dn_f"), lit(0L))).over(byCl))
      .withColumn("sy_f", coalesce(col("b_sy_f"), lit(0.0)) +
        sum(coalesce(col("dsy_f"), lit(0.0))).over(byCl))
      .withColumn("n_c", coalesce(col("b_n_c"), lit(0L)) +
        sum(coalesce(col("dn_c"), lit(0L))).over(byCl))
      .withColumn("sy_c", coalesce(col("b_sy_c"), lit(0.0)) +
        sum(coalesce(col("dsy_c"), lit(0.0))).over(byCl))
    val cum =
      if (!hasCuped)
        cum0.select("cluster", "day", "n_f", "sy_f", "n_c", "sy_c")
      else cum0
        .withColumn("sx_f", coalesce(col("b_sx_f"), lit(0.0)) +
          sum(coalesce(col("dsx_f"), lit(0.0))).over(byCl))
        .withColumn("sx_c", coalesce(col("b_sx_c"), lit(0.0)) +
          sum(coalesce(col("dsx_c"), lit(0.0))).over(byCl))
        .select("cluster", "day", "n_f", "sy_f", "n_c", "sy_c", "sx_f", "sx_c")
    val ready = col("n_a") >= 2 && col("n_b") >= 2
    val lnl = when(ready, graft.ops.SequentialTest.meanLogLambda(
      col("n_a").cast("double"), col("sum_a"), col("ssq_a"),
      col("n_b").cast("double"), col("sum_b"), col("ssq_b"), tau))
      .otherwise(lit(0.0))
    val cupedStatCols =
      if (!hasCuped) Seq.empty
      else {
        // cluster-level CUPED mSPRT: the SAME pair-pooled contrast the
        // subject-level paths use (cupedContrast by call), over cluster
        // means; a pre-upgrade ledger (no x sums) nulls the leg
        val (theta, deltaC, vC) = graft.ops.SequentialTest.cupedContrast(
          col("n_a").cast("double"), col("sum_a"), col("ssq_a"),
          col("sx_a"), col("sxx_a"), col("sxy_a"),
          col("n_b").cast("double"), col("sum_b"), col("ssq_b"),
          col("sx_b"), col("sxx_b"), col("sxy_b"))
        val legOk = lit(priorHasX) && ready
        val lnlC = when(legOk, graft.ops.SequentialTest.mSprtLogLambda(
          deltaC, vC, tau)).otherwise(
            when(lit(priorHasX), lit(0.0)).otherwise(lit(null).cast("double")))
        Seq(
          when(legOk, theta).as("theta_cluster"),
          when(legOk, deltaC).as("delta_cluster_cuped"),
          lnlC.as("log_lambda_cluster_cuped"))
      }
    val stats = graft.ops.SequentialTest.clusterLookStats(cum)
      .select(Seq(
        col("day").as("w_start"),
        col("n_a").as("cum_m_f"), col("n_b").as("cum_m_c"),
        col("mixed_m").as("cum_mixed_cluster_n"),
        when(col("n_a") > 0, col("sum_a") / col("n_a")).as("cluster_mean_f"),
        when(col("n_b") > 0, col("sum_b") / col("n_b")).as("cluster_mean_c"),
        lnl.as("log_lambda_cluster")) ++ cupedStatCols: _*)
    val w = graft.core.Windows.bounded(col("w_start"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out0 = windowRows.join(stats, Seq("w_start"), "left")
      .withColumn("max_log_lambda_cluster",
        greatest(lit(priorMax), max(col("log_lambda_cluster")).over(w)))
      .withColumn("p_always_valid_cluster",
        least(lit(1.0), exp(-col("max_log_lambda_cluster"))))
    val out =
      if (!hasCuped) out0
      else if (!priorHasX)
        // pre-upgrade ledger: the leg is honestly null (and stays null —
        // the new ledger below is kept x-less too, so a later batch
        // cannot resume the leg from partial x sums with a bent θ)
        out0
          .withColumn("max_log_lambda_cluster_cuped", lit(null).cast("double"))
          .withColumn("p_always_valid_cluster_cuped", lit(null).cast("double"))
      else out0
        .withColumn("max_log_lambda_cluster_cuped",
          greatest(lit(priorMaxCuped),
            max(col("log_lambda_cluster_cuped")).over(w)))
        .withColumn("p_always_valid_cluster_cuped",
          least(lit(1.0), exp(-col("max_log_lambda_cluster_cuped"))))
    val ledger =
      if (!anyWindow) None
      else {
        val lastFirst = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster").orderBy(col("day").desc)
        val keep = Seq("cluster", "n_f", "sy_f", "n_c", "sy_c") ++
          (if (hasCuped && priorHasX) Seq("sx_f", "sx_c") else Seq.empty)
        Some(cum.withColumn("__rn", row_number().over(lastFirst))
          .filter(col("__rn") === 1)
          .select(keep.head, keep.tail: _*))
      }
    (out, ledger)
  }

  /** The scorecard TRANSFORM alone (works on a batch frame too — the
    * spec pins streaming == batch on the same rows).
    *
    * `preCovariate = Some((dim, subjectCol, xCol))` turns on CUPED
    * variance reduction (VERDICT r15 item 6): the PRE-period covariate
    * joins as a static broadcast dim per micro-batch (the
    * [[enrichWithDim]] shape — stream-static joins before a windowed
    * aggregation are fully supported), the windowed aggregation carries
    * the per-arm CUPED moments as extra conditional sums on the SAME
    * state row, and the closed window reports theta / lift_cuped /
    * se_cuped / z_cuped / var_reduction beside the raw readout —
    * arithmetic IDENTICAL to [[graft.ops.Cuped.cuped]] on that window's
    * subjects (spec-pinned to 1e-12; var_reduction uses the
    * sample-variance Welch raw SE exactly as the batch estimator does).
    * Subjects missing from the dim adjust with x = 0; windows with
    * fewer than 2 subjects in an arm land with null adjusted columns
    * (no honest variance exists). State stays one row per open window. */
  private[graft] def experimentScorecard(
      events: DataFrame, armCol: String, convCol: String, tsCol: String,
      focal: String, control: String, focalShare: Double,
      windowLen: String, watermark: String,
      preCovariate: Option[(DataFrame, String, String)] = None,
      clusterCol: Option[String] = None): DataFrame = {
    require(focal != control, "focal and control must differ")
    require(focalShare > 0 && focalShare < 1,
      s"focalShare must be in (0,1), got $focalShare")
    clusterCol match {
      case Some(cc) =>
        return experimentScorecardClustered(
          events, armCol, convCol, tsCol, focal, control, focalShare,
          windowLen, watermark, preCovariate, cc)
      case None => ()
    }
    val arm = col(armCol).cast("string")
    val conv = col(convCol).cast("long")
    val src = preCovariate match {
      case None => events
      case Some((dim, subjectCol, xCol)) =>
        events.join(
          broadcast(dim.select(col(subjectCol),
            col(xCol).cast("double").as("__graft_x"))),
          Seq(subjectCol), "left")
          .withColumn("__graft_x", coalesce(col("__graft_x"), lit(0.0)))
    }
    val x = col("__graft_x")
    val y = conv.cast("double")
    def sideSum(cond: Column, e: Column, nm: String) =
      sum(when(cond, e).otherwise(lit(0.0))).as(nm)
    val cupedAggs =
      if (preCovariate.isEmpty) Seq.empty
      else Seq(
        sideSum(arm === focal, x, "sx_f"), sideSum(arm === focal, x * x, "sxx_f"),
        sideSum(arm === focal, x * y, "sxy_f"), sideSum(arm === focal, y * y, "syy_f"),
        sideSum(arm === control, x, "sx_c"), sideSum(arm === control, x * x, "sxx_c"),
        sideSum(arm === control, x * y, "sxy_c"), sideSum(arm === control, y * y, "syy_c"))
    val baseAggs = Seq(
      sum(when(arm === focal, 1L).otherwise(0L)).as("n_f"),
      sum(when(arm === focal, conv).otherwise(0L)).as("conv_f"),
      sum(when(arm === control, 1L).otherwise(0L)).as("n_c"),
      sum(when(arm === control, conv).otherwise(0L)).as("conv_c"),
      sum(when(arm =!= focal && arm =!= control, 1L).otherwise(0L))
        .as("undeclared_n")) ++ cupedAggs
    val agg = src
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(baseAggs.head, baseAggs.tail: _*)
    val pF = col("conv_f").cast("double") / col("n_f")
    val pC = col("conv_c").cast("double") / col("n_c")
    val haveBoth = col("n_f") > 0 && col("n_c") > 0
    val lift = when(haveBoth, pF - pC)
    val se = when(haveBoth,
      sqrt(pF * (lit(1.0) - pF) / col("n_f") + pC * (lit(1.0) - pC) / col("n_c")))
    val n = (col("n_f") + col("n_c")).cast("double")
    val expF = n * lit(focalShare)
    val expC = n * lit(1.0 - focalShare)
    val chi2 = when(n > 0,
      (col("n_f") - expF) * (col("n_f") - expF) / expF +
        (col("n_c") - expC) * (col("n_c") - expC) / expC)
    val pSrm = when(n > 0,
      graft.ops.Contingency.chi2UpperP(chi2, lit(1.0)))
    val baseCols = Seq(
      col("window.start").as("w_start"), col("window.end").as("w_end"),
      col("n_f"), col("conv_f"), col("n_c"), col("conv_c"),
      col("undeclared_n"),
      lift.as("lift"), se.as("se"),
      when(se > 0, lift / se).as("z"),
      chi2.as("srm_chi2"), pSrm.as("p_srm"),
      (coalesce(pSrm < 0.001, lit(false)) || col("undeclared_n") > 0).as("srm"))
    val cupedCols =
      if (preCovariate.isEmpty) Seq.empty
      else {
        val ready = col("n_f") >= 2 && col("n_c") >= 2
        val (theta, liftCuped, seCuped, varReduction) = cupedWindowCols()
        Seq(
          when(ready, theta).as("theta"),
          when(ready, liftCuped).as("lift_cuped"),
          when(ready, seCuped).as("se_cuped"),
          when(ready && seCuped > 0, liftCuped / seCuped).as("z_cuped"),
          when(ready, varReduction).as("var_reduction")) ++
          // the raw per-window moment sums ride along: they are the
          // ASSOCIATIVE facts a sink-side cumulative fold (the CUPED
          // always-valid leg) needs — per-window theta cannot be folded,
          // moments can
          Seq("sx_f", "sxx_f", "sxy_f", "syy_f",
            "sx_c", "sxx_c", "sxy_c", "syy_c").map(col)
      }
    agg.select(baseCols ++ cupedCols: _*)
  }

  /** [[graft.ops.Cuped.cuped]]'s closed form, verbatim, as window-row
    * column math over the per-window moment columns (n_f/conv_f/sx_f/…
    * naming shared by both scorecard paths). Returns (theta, lift_cuped,
    * se_cuped, var_reduction). `c` resolves a moment column by name —
    * the default reads the per-window columns; the sink's always-valid
    * fold passes `n => col(s"cum_$n")` so the SAME closed form runs on
    * cumulative moments (by call, drift-proof). */
  private def cupedWindowCols(c: String => Column = col): (Column, Column, Column, Column) = {
    val nF = c("n_f").cast("double")
    val nC = c("n_c").cast("double")
    val syF = c("conv_f").cast("double")
    val syC = c("conv_c").cast("double")
    val nn = nF + nC
    val sx = c("sx_f") + c("sx_c")
    val sy = syF + syC
    val sxx = c("sxx_f") + c("sxx_c")
    val sxy = c("sxy_f") + c("sxy_c")
    val mx = sx / nn
    val varXn = sxx - sx * sx / nn
    val theta = when(varXn > 0.0, (sxy - sx * sy / nn) / varXn)
      .otherwise(lit(0.0))
    def armStats(nA: Column, syA: Column, sxA: Column, sxxA: Column,
        syyA: Column, sxyA: Column): (Column, Column, Column, Column) = {
      val meanY = syA / nA
      val meanX = sxA / nA
      val varY = (syyA - syA * syA / nA) / (nA - 1)
      val varX = (sxxA - sxA * sxA / nA) / (nA - 1)
      val covXY = (sxyA - sxA * syA / nA) / (nA - 1)
      (meanY, meanX, varY,
        varY - lit(2.0) * theta * covXY + theta * theta * varX)
    }
    val (myF, mxF, varYF, varAdjF) =
      armStats(nF, syF, c("sx_f"), c("sxx_f"), c("syy_f"), c("sxy_f"))
    val (myC, mxC, varYC, varAdjC) =
      armStats(nC, syC, c("sx_c"), c("sxx_c"), c("syy_c"), c("sxy_c"))
    val liftCuped = (myF - theta * (mxF - mx)) - (myC - theta * (mxC - mx))
    val seRawSample = sqrt(varYF / nF + varYC / nC)
    val seCuped = sqrt(varAdjF / nF + varAdjC / nC)
    val varReduction = when(seRawSample > 0.0,
      lit(1.0) - (seCuped * seCuped) / (seRawSample * seRawSample))
      .otherwise(lit(0.0))
    (theta, liftCuped, seCuped, varReduction)
  }

  /** CLUSTER-randomized scorecard (VERDICT r15 item 2's streaming
    * clause): when assignment happens ABOVE the subject, per-window
    * inference must fold per-CLUSTER sums — two CHAINED windowed
    * aggregations in append mode (Spark supports stacked stateful
    * operators over the same event-time window since 3.4): the first
    * keys (window, cluster) and carries every within-cluster moment,
    * the second folds the clusters per window — state is
    * O(windows × clusters), the honest minimum for cluster inference
    * (the readout is a function of cluster sums), and still never
    * O(rows). The closed window reports m_f/m_c and the Liang-Zeger
    * robust_se_raw (plus robust_se_cuped with `preCovariate`) beside
    * the iid columns, with the SAME arithmetic as
    * [[graft.ops.Cuped.cuped]]'s clustered path (spec-pinned 1e-12).
    * A cluster seen in BOTH arms within a window is an assignment
    * defect the stream cannot refuse (the dead-letter discipline):
    * `mixed_cluster_n` counts them and the robust columns go null. */
  private def experimentScorecardClustered(
      events: DataFrame, armCol: String, convCol: String, tsCol: String,
      focal: String, control: String, focalShare: Double,
      windowLen: String, watermark: String,
      preCovariate: Option[(DataFrame, String, String)],
      clusterCol: String): DataFrame =
    clusteredFold(
      clusteredPerCluster(events, armCol, convCol, tsCol, focal, control,
        windowLen, watermark, preCovariate, clusterCol),
      focalShare)

  /** The clustered scorecard's FIRST stage alone — the (window, cluster)
    * keyed moment aggregation, the one stateful operator (state
    * O(windows × clusters)). Streaming-safe; the window fold
    * ([[clusteredFold]]) runs batch-side in the sink so the closed
    * per-cluster rows are visible at commit time — that visibility is
    * what lets the cluster ledger cumulate ACROSS windows, the fact the
    * pre-r18 two-chained-aggs topology folded away before the sink
    * could see it. */
  private[graft] def clusteredPerCluster(
      events: DataFrame, armCol: String, convCol: String, tsCol: String,
      focal: String, control: String,
      windowLen: String, watermark: String,
      preCovariate: Option[(DataFrame, String, String)],
      clusterCol: String): DataFrame = {
    val arm = col(armCol).cast("string")
    val conv = col(convCol).cast("long")
    val src = preCovariate match {
      case None => events
      case Some((dim, subjectCol, xCol)) =>
        events.join(
          broadcast(dim.select(col(subjectCol),
            col(xCol).cast("double").as("__graft_x"))),
          Seq(subjectCol), "left")
          .withColumn("__graft_x", coalesce(col("__graft_x"), lit(0.0)))
    }
    val x = col("__graft_x")
    val y = conv.cast("double")
    val isF = arm === focal
    val isC = arm === control
    def sideSum(cond: Column, e: Column, nm: String) =
      sum(when(cond, e).otherwise(lit(0.0))).as(nm)
    val cupedAggs1 =
      if (preCovariate.isEmpty) Seq.empty
      else Seq(
        sideSum(isF, x, "sxf"), sideSum(isF, x * x, "sxxf"),
        sideSum(isF, x * y, "sxyf"), sideSum(isF, y * y, "syyf"),
        sideSum(isC, x, "sxc"), sideSum(isC, x * x, "sxxc"),
        sideSum(isC, x * y, "sxyc"), sideSum(isC, y * y, "syyc"))
    val aggs1 = Seq(
      sum(when(isF, 1L).otherwise(0L)).as("nf"),
      sideSum(isF, y, "syf"),
      sum(when(isC, 1L).otherwise(0L)).as("nc"),
      sideSum(isC, y, "syc"),
      sum(when(!isF && !isC, 1L).otherwise(0L)).as("und")) ++ cupedAggs1
    src
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        col(clusterCol).cast("string").as("__cl"))
      .agg(aggs1.head, aggs1.tail: _*)
  }

  /** The clustered scorecard's SECOND stage — fold the per-cluster rows
    * of each window into the window's readout (counts, lift/se/z, SRM,
    * Liang-Zeger robust SEs, CUPED when the moment columns ride). Plain
    * batch aggregation: identical arithmetic whether it runs inside a
    * batch transform ([[experimentScorecardClustered]]) or on a
    * micro-batch of closed windows in the sink. CUPED presence is read
    * off the frame's columns, same policy as [[alwaysValidFold]]. */
  private[graft] def clusteredFold(
      perCluster: DataFrame, focalShare: Double): DataFrame = {
    val hasCuped = perCluster.columns.contains("sxf")
    val pureF = col("nf") > 0 && col("nc") === 0
    val pureC = col("nc") > 0 && col("nf") === 0
    def sideSum(cond: Column, e: Column, nm: String) =
      sum(when(cond, e).otherwise(lit(0.0))).as(nm)
    val cupedFold =
      if (!hasCuped) Seq.empty
      else Seq(
        sum(col("sxf")).as("sx_f"), sum(col("sxxf")).as("sxx_f"),
        sum(col("sxyf")).as("sxy_f"), sum(col("syyf")).as("syy_f"),
        sum(col("sxc")).as("sx_c"), sum(col("sxxc")).as("sxx_c"),
        sum(col("sxyc")).as("sxy_c"), sum(col("syyc")).as("syy_c"),
        sideSum(pureF, col("sxf") * col("sxf"), "cxx_f"),
        sideSum(pureF, col("syf") * col("sxf"), "cyx_f"),
        sideSum(pureF, col("sxf") * col("nf"), "cxn_f"),
        sideSum(pureC, col("sxc") * col("sxc"), "cxx_c"),
        sideSum(pureC, col("syc") * col("sxc"), "cyx_c"),
        sideSum(pureC, col("sxc") * col("nc"), "cxn_c"))
    val aggs2 = Seq(
      sum(col("nf")).as("n_f"),
      sum(col("syf")).cast("long").as("conv_f"),
      sum(col("nc")).as("n_c"),
      sum(col("syc")).cast("long").as("conv_c"),
      sum(col("und")).as("undeclared_n"),
      sum(when(pureF, 1L).otherwise(0L)).as("m_f"),
      sum(when(pureC, 1L).otherwise(0L)).as("m_c"),
      sum(when(col("nf") > 0 && col("nc") > 0, 1L).otherwise(0L))
        .as("mixed_cluster_n"),
      sideSum(pureF, col("syf") * col("syf"), "cyy_f"),
      sideSum(pureF, col("syf") * col("nf"), "cyn_f"),
      sideSum(pureF, col("nf") * col("nf"), "nn_f"),
      sideSum(pureC, col("syc") * col("syc"), "cyy_c"),
      sideSum(pureC, col("syc") * col("nc"), "cyn_c"),
      sideSum(pureC, col("nc") * col("nc"), "nn_c")) ++ cupedFold
    val agg = perCluster.groupBy(col("window")).agg(aggs2.head, aggs2.tail: _*)
    val pF = col("conv_f").cast("double") / col("n_f")
    val pC = col("conv_c").cast("double") / col("n_c")
    val haveBoth = col("n_f") > 0 && col("n_c") > 0
    val lift = when(haveBoth, pF - pC)
    val se = when(haveBoth,
      sqrt(pF * (lit(1.0) - pF) / col("n_f") + pC * (lit(1.0) - pC) / col("n_c")))
    val n = (col("n_f") + col("n_c")).cast("double")
    val expF = n * lit(focalShare)
    val expC = n * lit(1.0 - focalShare)
    val chi2 = when(n > 0,
      (col("n_f") - expF) * (col("n_f") - expF) / expF +
        (col("n_c") - expC) * (col("n_c") - expC) / expC)
    val pSrm = when(n > 0,
      graft.ops.Contingency.chi2UpperP(chi2, lit(1.0)))
    val baseCols = Seq(
      col("window.start").as("w_start"), col("window.end").as("w_end"),
      col("n_f"), col("conv_f"), col("n_c"), col("conv_c"),
      col("undeclared_n"),
      lift.as("lift"), se.as("se"),
      when(se > 0, lift / se).as("z"),
      chi2.as("srm_chi2"), pSrm.as("p_srm"),
      (coalesce(pSrm < 0.001, lit(false)) || col("undeclared_n") > 0).as("srm"))
    val readyIid = col("n_f") >= 2 && col("n_c") >= 2
    val readyRobust = readyIid && col("m_f") >= 2 && col("m_c") >= 2 &&
      col("mixed_cluster_n") === 0
    // Liang-Zeger one-way fold per arm, Cuped.cupedClustered's closed
    // form: V = m/(m−1)·(ΣT² − 2t̄·ΣTn + t̄²·Σn²)/n² with T_c the
    // cluster sum of the (adjusted) metric
    def robustVar(th: Column, nA: Column, mA: Column, syA: Column, sxA: Column,
        cyyA: Column, cyxA: Column, cxxA: Column, cynA: Column, cxnA: Column,
        nnA: Column): Column = {
      val tt2 = cyyA - lit(2.0) * th * cyxA + th * th * cxxA
      val ttn = cynA - th * cxnA
      val tbar = (syA - th * sxA) / nA
      mA.cast("double") / (mA - 1) *
        (tt2 - lit(2.0) * tbar * ttn + tbar * tbar * nnA) /
        (nA.cast("double") * nA)
    }
    val zeroC = lit(0.0)
    val robustSeRaw = sqrt(
      robustVar(lit(0.0), col("n_f"), col("m_f"), col("conv_f").cast("double"),
        zeroC, col("cyy_f"), zeroC, zeroC, col("cyn_f"), zeroC, col("nn_f")) +
      robustVar(lit(0.0), col("n_c"), col("m_c"), col("conv_c").cast("double"),
        zeroC, col("cyy_c"), zeroC, zeroC, col("cyn_c"), zeroC, col("nn_c")))
    val clusterCols0 = Seq(
      col("m_f"), col("m_c"), col("mixed_cluster_n"),
      when(readyRobust, robustSeRaw).as("robust_se_raw"))
    val (cupedCols, robustCupedCols) =
      if (!hasCuped) (Seq.empty, Seq.empty)
      else {
        val (theta, liftCuped, seCuped, varReduction) = cupedWindowCols()
        val robustSeCuped = sqrt(
          robustVar(theta, col("n_f"), col("m_f"), col("conv_f").cast("double"),
            col("sx_f"), col("cyy_f"), col("cyx_f"), col("cxx_f"),
            col("cyn_f"), col("cxn_f"), col("nn_f")) +
          robustVar(theta, col("n_c"), col("m_c"), col("conv_c").cast("double"),
            col("sx_c"), col("cyy_c"), col("cyx_c"), col("cxx_c"),
            col("cyn_c"), col("cxn_c"), col("nn_c")))
        (Seq(
          when(readyIid, theta).as("theta"),
          when(readyIid, liftCuped).as("lift_cuped"),
          when(readyIid, seCuped).as("se_cuped"),
          when(readyIid && seCuped > 0, liftCuped / seCuped).as("z_cuped"),
          when(readyIid, varReduction).as("var_reduction")),
         Seq(when(readyRobust, robustSeCuped).as("robust_se_cuped")))
      }
    agg.select(baseCols ++ cupedCols ++ clusterCols0 ++ robustCupedCols: _*)
  }

  /** One (timestamp, term) occurrence on the input stream. */
  final case class TermEvent(ts: java.sql.Timestamp, term: String)
  /** One trending term of a CLOSED window: rank by estimated count
    * (ties by term). */
  final case class TrendRow(
      window_start: java.sql.Timestamp, term: String, cnt_est: Long, rk: Int)

  /** Streaming trending terms: per tumbling window, the top-k terms by
    * frequency, emitted ONCE when the watermark closes the window.
    *
    * The naive shape — `groupBy(window, term).count` — keeps one state row
    * per (window, term): at web scale that is the vocabulary, billions of
    * rows of state per window. Here state is a Misra-Gries summary of at
    * most `sketch` counters per OPEN window
    * ([[graft.ops.HeavyHitters.MisraGriesAgg]]'s reduce step applied
    * incrementally), so state is O(windows_in_flight × sketch) regardless
    * of vocabulary — the bounded-memory contract streaming top-k needs.
    * MG guarantee carries over: any term with frequency > n/(sketch+1) in
    * its window survives; counts under-estimate by at most that bound
    * (exact when the window's distinct terms fit in the sketch, which is
    * what the spec pins). Emission is on EVENT-TIME TIMEOUT — one
    * append-mode result set per window, late terms beyond the watermark
    * dropped exactly like Spark's own windowed aggregation in append
    * mode. */
  def trendingTerms(
      spark: SparkSession, terms: Dataset[TermEvent], windowMs: Long,
      k: Int = 5, sketch: Int = 256,
      watermark: String = "10 minutes"): Dataset[TrendRow] = {
    import spark.implicits._
    require(windowMs > 0 && k >= 1 && sketch >= k)
    val mg = new graft.ops.HeavyHitters.MisraGriesAgg(sketch)
    terms
      .withWatermark("ts", watermark)
      // the watermarked ts ATTRIBUTE must survive into the stateful
      // operator's input (a .map to a tuple would erase the event-time
      // marker and fail the unsupported-operations check), so the window
      // start is added as a column beside it
      .select(
        col("ts"),
        (unix_millis(col("ts")) - pmod(unix_millis(col("ts")), lit(windowMs))).as("wstart"),
        col("term"))
      .as[(java.sql.Timestamp, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstart: Long, batch: Iterator[(java.sql.Timestamp, Long, String)],
         state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.getOption.getOrElse(Map.empty[String, Long])
            state.remove()
            counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
              .zipWithIndex.iterator.map { case ((t, c), i) =>
                TrendRow(new java.sql.Timestamp(wstart), t, c, i + 1)
              }
          } else {
            val upd = batch.foldLeft(
              state.getOption.getOrElse(Map.empty[String, Long])) {
              (m, e) => mg.reduce(m, e._3)
            }
            state.update(upd)
            // fires when the WATERMARK passes the window end — the same
            // close signal append-mode windowed aggregation uses
            state.setTimeoutTimestamp(wstart + windowMs)
            Iterator.empty
          }
      }
  }
}
