package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.streaming.EventStreams

/** Contract of [[EventStreams.startFanoutVersionedSink]]: every
  * destination is independently exactly-once, INCLUDING the
  * crash-between-destination-commits window — a replayed batch no-ops
  * where it already landed and applies where it didn't, so all
  * destinations converge to exactly one copy per batch.
  */
class FanoutSinkSpec extends SparkSuite {
  import spark.implicits._

  private def dirs() = {
    val root = Files.createTempDirectory("fanout").toFile
    root.deleteOnExit()
    (root + "/a", root + "/b", root + "/ckpt")
  }

  private val sinksOf: (String, String) => Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] =
    (a, b) => Seq(
      a -> identity[org.apache.spark.sql.DataFrame] _,
      b -> ((df: org.apache.spark.sql.DataFrame) => df.filter(col("id") % 2 === 0)))

  test("crash BETWEEN destination commits converges on batch replay") {
    val (a, b, _) = dirs()
    val sinks = sinksOf(a, b)
    val batch0 = Seq((1L, "x"), (2L, "y")).toDF("id", "s")

    // simulated crash: destination A commits batch 0, B never sees it
    VersionedTable.commitStreamBatch(batch0, a, "w.0", 0L)
    // restart replays the WHOLE batch through the fanout body
    EventStreams.applyFanout(batch0, 0L, sinks, "w")
    // A absorbed the replay (one copy), B applied it (one copy, filtered)
    assert(VersionedTable.read(spark, a).count() == 2L)
    assert(VersionedTable.read(spark, a).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    assert(VersionedTable.read(spark, b).select("id").as[Long].collect().toSeq == Seq(2L))

    // a second replay of the same batch is a full no-op everywhere
    EventStreams.applyFanout(batch0, 0L, sinks, "w")
    assert(VersionedTable.read(spark, a).count() == 2L)
    assert(VersionedTable.read(spark, b).count() == 1L)

    // the next batch lands once in each
    EventStreams.applyFanout(Seq((4L, "z")).toDF("id", "s"), 1L, sinks, "w")
    assert(VersionedTable.read(spark, a).count() == 3L)
    assert(VersionedTable.read(spark, b).select("id").as[Long].collect().sorted.toSeq
      == Seq(2L, 4L))
  }

  test("live stream fans out to both tables exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (a, b, ckpt) = dirs()
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "x"), (2L, "y"), (3L, "z"))
    val q = EventStreams.startFanoutVersionedSink(
      ms.toDF().toDF("id", "s"), sinksOf(a, b), "w", ckpt)
    try {
      q.processAllAvailable()
      ms.addData((4L, "w"))
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.read(spark, a).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    assert(VersionedTable.read(spark, b).select("id").as[Long].collect().sorted.toSeq
      == Seq(2L, 4L))
  }
}
