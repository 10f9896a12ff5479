package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.io.VersionedTable

/** `graft-vt-stream` — the versioned table as a Structured Streaming
  * source: snapshot bootstrap, checkpointed incremental tail reads,
  * refusal vs skip vs CDF semantics across maintenance commits. */
class VersionedStreamSourceSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("vt_stream").toString

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"row_$i")).toDF("id", "v")

  /** Run the stream until drained, then stop (v1-source-friendly). */
  private def drain(
      tbl: String, out: String, ckpt: String, opts: Map[String, String] = Map.empty): Unit = {
    val q = opts.foldLeft(
        spark.readStream.format("graft-vt-stream").option("path", tbl)) {
        case (r, (k, vv)) => r.option(k, vv)
      }
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("snapshot bootstrap then checkpointed incremental appends, exactly once") {
    val base = freshDir()
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    VersionedTable.commitAppend(batch(0, 50), tbl)
    VersionedTable.commitAppend(batch(50, 80), tbl)
    drain(tbl, out, ckpt)
    assert(spark.read.parquet(out).count() == 80, "bootstrap must cover the full snapshot")
    // two more commits while the stream is down: the checkpoint resumes
    // at the version watermark and emits ONLY the new files' rows
    VersionedTable.commitAppend(batch(80, 100), tbl)
    VersionedTable.commitAppend(batch(100, 130), tbl)
    drain(tbl, out, ckpt)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 130)
    assert(rows.select(countDistinct(col("id"))).head().getLong(0) == 130,
      "a row was re-emitted or lost across the restart")
    // idempotent: no new data -> no new rows
    drain(tbl, out, ckpt)
    assert(spark.read.parquet(out).count() == 130)
  }

  test("maxVersionsPerTrigger bounds each micro-batch to one version's increment") {
    val base = freshDir()
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def drainCapped(): Unit = {
      val q = spark.readStream.format("graft-vt-stream")
        .option("path", tbl).option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.select("id").collect().map(_.getLong(0)).toSet
          if (ids.nonEmpty) batches.synchronized { batches += ids }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    VersionedTable.commitAppend(batch(0, 10), tbl) // v1
    drainCapped() // bootstrap: the snapshot is one batch
    assert(batches.synchronized(batches.toSeq).map(_.size) == Seq(10))
    // a deep backlog accumulates while the consumer is down...
    VersionedTable.commitAppend(batch(10, 25), tbl) // v2
    VersionedTable.commitAppend(batch(25, 45), tbl) // v3
    VersionedTable.commitAppend(batch(45, 70), tbl) // v4
    drainCapped()
    // ...and drains as BOUNDED windows: the persisted rate-limit base
    // survives the restart, so each micro-batch carries ONE version
    val got = batches.synchronized { batches.toSeq }
    assert(got.map(_.size) == Seq(10, 15, 20, 25),
      s"expected one version per micro-batch, got sizes ${got.map(_.size)}")
    assert(got.flatten.toSet == (0L until 70L).toSet, "no row lost or duplicated")
    // steady-state after another restart: exactly once, still capped
    VersionedTable.commitAppend(batch(70, 80), tbl) // v5
    drainCapped()
    val all = batches.synchronized { batches.toSeq }
    assert(all.map(_.size) == Seq(10, 15, 20, 25, 10))
    assert(all.flatten.toSet == (0L until 80L).toSet,
      "restart must resume from the checkpoint and drain the new version exactly once")
  }

  test("a delete in the window fails the default stream; skipChangeCommits rides through") {
    val base = freshDir()
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    VersionedTable.commitAppend(batch(0, 40), tbl)
    drain(tbl, out, ckpt)
    VersionedTable.deleteWhere(spark, tbl, col("id") < 10)
    VersionedTable.commitAppend(batch(40, 60), tbl)
    // default semantics: refuse rather than silently drop the delete
    val ex = intercept[StreamingQueryException] { drain(tbl, out, ckpt) }
    assert(ex.getMessage.contains("append-only") || ex.getCause.getMessage.contains("append-only"))
    // appends-only consumer: same checkpoint, maintenance tolerated —
    // the new append flows, the delete contributes nothing
    drain(tbl, out, ckpt, Map("skipChangeCommits" -> "true"))
    val rows = spark.read.parquet(out)
    assert(rows.count() == 60, "append after the delete must flow exactly once")
    assert(rows.filter(col("id") < 10).count() == 10,
      "appends-only semantics: bootstrap rows are never retracted")
  }

  test("startTableMirror keeps a hot replica current, exactly once across restarts") {
    val base = freshDir()
    val src = s"$base/src"; val dst = s"$base/dst"; val ckpt = s"$base/ckpt"
    VersionedTable.commitAppend(batch(0, 40), src)
    def mirrorOnce(): Unit = {
      val q = graft.streaming.EventStreams.startTableMirror(
        spark, src, dst, "mirror1", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    mirrorOnce()
    assert(VersionedTable.read(spark, dst).count() == 40)
    // new commits while the mirror is down: restart drains only the delta
    VersionedTable.commitAppend(batch(40, 70), src)
    VersionedTable.commitAppend(batch(70, 90), src)
    mirrorOnce()
    val rows = VersionedTable.read(spark, dst)
    assert(rows.count() == 90)
    assert(rows.select(countDistinct(col("id"))).head().getLong(0) == 90,
      "mirror duplicated or lost rows across the restart")
    // no-op cycle: nothing new, nothing lands
    val vBefore = VersionedTable.versions(spark, dst).last
    mirrorOnce()
    assert(VersionedTable.versions(spark, dst).last == vBefore)
  }

  test("readChangeFeed streams the row-level CDF across deletes; replay reproduces the table") {
    val base = freshDir()
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    VersionedTable.commitAppend(batch(0, 30), tbl)
    drain(tbl, out, ckpt, Map("readChangeFeed" -> "true"))
    val boot = spark.read.parquet(out)
    assert(boot.count() == 30)
    assert(boot.filter(col("_change_type") =!= "insert").count() == 0)
    // a delete and an append while down; the CDF window carries both
    VersionedTable.deleteWhere(spark, tbl, col("id") % 3 === 0)
    VersionedTable.commitAppend(batch(30, 40), tbl)
    drain(tbl, out, ckpt, Map("readChangeFeed" -> "true"))
    val feed = spark.read.parquet(out)
    // replay: inserts minus deletes (by row identity) == current table
    val replayed = feed.filter(col("_change_type") === "insert")
      .select("id", "v")
      .exceptAll(feed.filter(col("_change_type") === "delete").select("id", "v"))
    val now = VersionedTable.read(spark, tbl).select("id", "v")
    assert(replayed.exceptAll(now).isEmpty && now.exceptAll(replayed).isEmpty,
      "CDF replay must reproduce the live table state")
  }
}
