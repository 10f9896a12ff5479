package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

import graft.io.VersionedTable
import graft.streaming.EventStreams

/** Streaming CDC apply (`EventStreams.startCdcMergeSink`): each
  * micro-batch of keyed upsert/delete images MERGES into a versioned
  * table; `foreachBatch`'s at-least-once delivery is absorbed by
  * `mergeBatch`'s (writerId, batchId) txn gate. The replay test deletes
  * the checkpoint's last commit marker — the same simulated crash window
  * as ExactlyOnceSinkSpec. */
class CdcMergeSinkSpec extends SparkSuite {
  import spark.implicits._

  test("merge bootstrap on an empty table inserts the batch and gates the txn") {
    val tbl = Files.createTempDirectory("cdcboot").toString + "/t"
    val b0 = Seq((1L, "a", false), (2L, "dead", true)).toDF("id", "v", "_del")
    val r = VersionedTable.mergeBatch(spark, tbl, b0, Seq("id"), "w", 0L,
      deleteFlag = Some("_del"))
    assert(r.isDefined && r.get.upsertRows == 1L)
    assert(VersionedTable.read(spark, tbl).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    // replay of the bootstrap batch is a no-op
    assert(VersionedTable.mergeBatch(spark, tbl, b0, Seq("id"), "w", 0L,
      deleteFlag = Some("_del")).isEmpty)
    assert(VersionedTable.versions(spark, tbl) == Seq(1L))
  }

  test("forced replay of a CDC micro-batch leaves the merged table exactly-once") {
    val base = Files.createTempDirectory("cdc_e2e").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"

    def writeBatchFile(name: String, rows: Seq[(Long, String, Boolean)]): Unit =
      Files.writeString(
        Paths.get(src, name),
        rows.map { case (id, v, del) => s"""{"id":$id,"v":"$v","_del":$del}""" }
          .mkString("", "\n", "\n"))

    val seen = mutable.ArrayBuffer.empty[(Long, Option[VersionedTable.MergeResult])]
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(StructType(Seq(
          StructField("id", LongType), StructField("v", StringType),
          StructField("_del", BooleanType))))
        .option("maxFilesPerTrigger", "1")
        .json(src)
      val q = EventStreams.startCdcMergeSink(
        stream, tbl, Seq("id"), "cdc", ckpt, deleteFlag = Some("_del"),
        onBatch = (b, r) => seen.synchronized { seen += b -> r })
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(60000)
    }

    // batch 0: initial images; batch 1: update 3, delete 5, insert 11
    writeBatchFile("f0.json", (1L to 10L).map(i => (i, s"v$i", false)))
    writeBatchFile("f1.json", Seq((3L, "v3_new", false), (5L, "", true), (11L, "v11", false)))
    runOnce()
    val after1 = VersionedTable.read(spark, tbl).as[(Long, String)].collect().toMap
    assert(after1.size == 10, s"10 live keys, got ${after1.size}")
    assert(after1(3L) == "v3_new" && !after1.contains(5L) && after1(11L) == "v11")
    assert(seen.forall(_._2.isDefined), s"first run must apply all batches: $seen")

    // crash window: sink merged batch N, checkpoint never recorded it
    val commits = Paths.get(ckpt, "commits")
    val last = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit)).toSeq
      .sortBy(_.getFileName.toString.toLong).last
    Files.delete(last)
    Files.deleteIfExists(last.resolveSibling("." + last.getFileName.toString + ".crc"))

    seen.clear()
    writeBatchFile("f2.json", Seq((7L, "v7_new", false))) // genuinely new
    runOnce()
    assert(seen.exists { case (_, r) => r.isEmpty }, s"no replay was absorbed: $seen")
    val rows = VersionedTable.read(spark, tbl).as[(Long, String)].collect().toMap
    assert(rows.size == 10)
    assert(rows(3L) == "v3_new" && rows(7L) == "v7_new" && !rows.contains(5L))
    // key-uniqueness invariant held through replays
    assert(VersionedTable.read(spark, tbl)
      .groupBy("id").count().filter(col("count") > 1).count() == 0)
  }
}
