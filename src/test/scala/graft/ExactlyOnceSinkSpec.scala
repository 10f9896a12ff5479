package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.streaming.EventStreams

/** Exactly-once streaming delivery into the versioned table:
  * `foreachBatch` is at-least-once (a crash between the sink write and the
  * checkpoint commit replays the micro-batch), and
  * [[VersionedTable.commitStreamBatch]]'s (writerId, batchId) manifest
  * watermark absorbs the replay. The end-to-end test FORCES a real replay
  * by deleting the checkpoint's last commit marker — the strongest local
  * simulation of the crash window. */
class ExactlyOnceSinkSpec extends SparkSuite {
  import spark.implicits._

  test("commitStreamBatch is idempotent per (writer, batch) and monotone per writer") {
    val tbl = Files.createTempDirectory("eos_tbl").toString + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b1 = Seq((3L, "c")).toDF("id", "s")

    assert(VersionedTable.commitStreamBatch(b0, tbl, "w", 0L).contains(1L))
    assert(VersionedTable.commitStreamBatch(b1, tbl, "w", 1L).contains(2L))
    // replay of the current batch: skipped, no new version, rows unchanged
    assert(VersionedTable.commitStreamBatch(b1, tbl, "w", 1L).isEmpty)
    // replay of an OLDER batch (restart from a stale checkpoint): skipped
    assert(VersionedTable.commitStreamBatch(b0, tbl, "w", 0L).isEmpty)
    assert(VersionedTable.versions(spark, tbl) == Seq(1L, 2L))
    assert(VersionedTable.read(spark, tbl).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // a DIFFERENT writer with the same batchId is independent
    assert(VersionedTable.commitStreamBatch(b0, tbl, "w2", 1L).contains(3L))
  }

  test("the txn watermark survives interleaved batch commits AND vacuum") {
    val tbl = Files.createTempDirectory("eos_vac").toString + "/t"
    VersionedTable.commitStreamBatch(Seq((1L, "a")).toDF("id", "s"), tbl, "w", 0L)
    // interleaved plain append + overwrite must carry the map forward
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "s"), tbl)
    VersionedTable.commitOverwrite(Seq((9L, "z")).toDF("id", "s"), tbl)
    assert(VersionedTable.lastCommittedBatch(spark, tbl, "w").contains(0L))
    assert(VersionedTable.commitStreamBatch(Seq((1L, "a")).toDF("id", "s"), tbl, "w", 0L).isEmpty)
    // vacuum to the single latest version: the manifest that ORIGINALLY
    // recorded batch 0 is gone, but the carried-forward map still knows it
    VersionedTable.vacuum(spark, tbl, keepLast = 1)
    assert(VersionedTable.lastCommittedBatch(spark, tbl, "w").contains(0L))
    assert(VersionedTable.commitStreamBatch(Seq((1L, "a")).toDF("id", "s"), tbl, "w", 0L).isEmpty)
  }

  test("incremental mirroring copies exactly each source window, once") {
    val base = Files.createTempDirectory("eos_mirror").toString
    val src = s"$base/src"; val dst = s"$base/dst"
    def rows(tbl: String): Seq[(Long, String)] =
      VersionedTable.read(spark, tbl).as[(Long, String)].collect().sorted.toSeq
    VersionedTable.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), src)
    VersionedTable.commitAppend(Seq((3L, "c")).toDF("id", "s"), src)
    // bootstrap: full current snapshot
    assert(VersionedTable.mirrorChanges(spark, src, dst, "mirror").contains((0L, 2L)))
    assert(rows(dst) == rows(src))
    // already current: no-op, no new destination version
    val vs = VersionedTable.versions(spark, dst)
    assert(VersionedTable.mirrorChanges(spark, src, dst, "mirror").isEmpty)
    assert(VersionedTable.versions(spark, dst) == vs)
    // a new source append mirrors as exactly the increment
    VersionedTable.commitAppend(Seq((4L, "d")).toDF("id", "s"), src)
    assert(VersionedTable.mirrorChanges(spark, src, dst, "mirror").contains((2L, 3L)))
    assert(rows(dst) == rows(src))
    // destination history shows the consumer's watermark advancing
    assert(VersionedTable.lastCommittedBatch(spark, dst, "mirror").contains(3L))
    // a source overwrite breaks the append-only window contract: the
    // mirror must NOT wedge — it falls back to a full snapshot re-sync
    // (overwrite at the new watermark) and stays exactly-once
    VersionedTable.commitOverwrite(Seq((9L, "z")).toDF("id", "s"), src)
    assert(VersionedTable.mirrorChanges(spark, src, dst, "mirror").contains((3L, 4L)))
    assert(rows(dst) == rows(src))
    assert(VersionedTable.lastCommittedBatch(spark, dst, "mirror").contains(4L))
    // same for compaction in the window — routine maintenance must compose
    VersionedTable.commitAppend(Seq((10L, "y")).toDF("id", "s"), src)
    VersionedTable.commitAppend(Seq((11L, "x")).toDF("id", "s"), src)
    VersionedTable.compact(spark, src, targetRowsPerFile = 1000000)
    assert(VersionedTable.mirrorChanges(spark, src, dst, "mirror").contains((4L, 7L)))
    assert(rows(dst) == rows(src))
    // and for a vacuumed watermark: retention dropped past the consumer
    VersionedTable.commitAppend(Seq((12L, "w")).toDF("id", "s"), src)
    VersionedTable.commitAppend(Seq((13L, "v")).toDF("id", "s"), src)
    VersionedTable.vacuum(spark, src, keepLast = 1)
    assert(VersionedTable.mirrorChanges(spark, src, dst, "mirror").isDefined)
    assert(rows(dst) == rows(src))
  }

  test("forced micro-batch replay after a simulated crash leaves the table exactly-once") {
    val base = Files.createTempDirectory("eos_e2e").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"

    def writeJsonl(name: String, rows: Seq[Long]): Unit =
      Files.writeString(
        Paths.get(src, name),
        rows.map(i => s"""{"id":$i}""").mkString("", "\n", "\n"))

    val seen = mutable.ArrayBuffer.empty[(Long, Option[Long])]
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
        .option("maxFilesPerTrigger", "1") // one file per micro-batch
        .json(src)
      val q = EventStreams.startExactlyOnceVersionedSink(
        stream, tbl, "ingest", ckpt, onBatch = (b, v) => seen.synchronized { seen += b -> v })
      // AvailableNow isn't set on the helper; drain by processing all and stopping
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(60000) // fully release the checkpoint before a restart
    }

    writeJsonl("f0.json", 1L to 10L)
    writeJsonl("f1.json", 11L to 20L)
    runOnce()
    assert(VersionedTable.read(spark, tbl).count() == 20)
    val committedFirst = seen.toList
    assert(committedFirst.forall(_._2.isDefined), s"first run must commit all: $committedFirst")

    // Simulate the crash window: the sink wrote batch N but the checkpoint
    // never recorded completion -> delete the LAST commit marker, restart.
    val commits = Paths.get(ckpt, "commits")
    val last = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit)).toSeq
      .sortBy(_.getFileName.toString.toLong).last
    Files.delete(last)
    // the local-FS checksum sidecar must go with it, or the re-commit's
    // rename collides on the stale .crc
    Files.deleteIfExists(last.resolveSibling("." + last.getFileName.toString + ".crc"))

    seen.clear()
    writeJsonl("f2.json", 21L to 25L) // plus genuinely new data
    runOnce()
    // the replayed batch must be detected as a duplicate...
    assert(seen.exists { case (_, v) => v.isEmpty }, s"no replay was absorbed: $seen")
    // ...and the table holds every id exactly once
    val rows = VersionedTable.read(spark, tbl)
    assert(rows.count() == 25)
    assert(rows.select(countDistinct(col("id"))).head().getLong(0) == 25)
  }
}
