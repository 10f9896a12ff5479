package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.streaming.EventStreams

/** Audited WAP sink ([[EventStreams.startAuditedVersionedSink]]): clean
  * micro-batches publish, failing batches quarantine WHOLE with their
  * violations, the main table never sees unaudited rows, replays
  * converge (txn-gated publish, replayed stage aborted), and no staging
  * debris is left either way. */
class AuditedSinkSpec extends SparkSuite {
  import spark.implicits._

  private def audit(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val bad = df.filter(col("v") < 0).count()
    if (bad > 0) Seq(s"$bad negative values") else Seq.empty
  }

  test("clean batches publish, bad batches quarantine whole, no staging debris") {
    val tmp = java.nio.file.Files.createTempDirectory("auditsink").toString
    val tbl = tmp + "/tbl"; val quar = tmp + "/quarantine"; val ckpt = tmp + "/ckpt"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val outcomes = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = EventStreams.startAuditedVersionedSink(
      mem.toDF().toDF("id", "v"), tbl, quar, "auditor", ckpt, audit,
      onBatch = (b, r) => outcomes.synchronized { outcomes += ((b, r.isRight)); () })
    try {
      mem.addData((1L, 1.0), (2L, 2.0)); q.processAllAvailable() // clean
      mem.addData((3L, 3.0), (4L, -4.0)); q.processAllAvailable() // one bad row => batch fails
      mem.addData((5L, 5.0)); q.processAllAvailable() // clean
      val main = VersionedTable.read(spark, tbl).select("id").as[Long].collect().sorted
      assert(main.toSeq == Seq(1L, 2L, 5L), "only audited batches in the main table")
      assert(VersionedTable.read(spark, quar).count() == 2)
      assert(outcomes.synchronized(outcomes.toSeq).count(!_._2) == 1,
        "exactly one batch reported failing")
      val qRows = VersionedTable.read(spark, quar)
        .select("id", "_audit_failures").collect()
      assert(qRows.map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L),
        "the WHOLE failing batch quarantines")
      assert(qRows.forall(_.getString(1).contains("negative")))
      // no UNREFERENCED staging debris anywhere: published stages are
      // adopted in place (their dirs are referenced); aborted ones are
      // deleted — explicit reclamation with a future cutoff finds nothing
      assert(VersionedTable.vacuumStaging(
        spark, tbl, System.currentTimeMillis() + 60000) == 0)
      assert(Option(new java.io.File(s"$quar/data").list()).getOrElse(Array.empty)
        .count(_.startsWith("staging-")) == 0, "quarantine commits are plain appends")
    } finally q.stop()
  }

  test("Expectations.asAudit plugs the declarative gate straight into the sink") {
    import graft.ops.Expectations
    import graft.ops.Expectations.Expectation
    val tmp = java.nio.file.Files.createTempDirectory("auditsink4").toString
    val tbl = tmp + "/tbl"; val quar = tmp + "/quarantine"; val ckpt = tmp + "/ckpt"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gate = Expectations.asAudit(Seq(
      Expectation("nonneg_share", Expectations.ratio(col("v") >= 0), 1.0, 1.0),
      Expectation("batch_rows", count(lit(1)).cast("double"), 1, 100)))
    val mem = MemoryStream[(Long, Double)]
    val q = EventStreams.startAuditedVersionedSink(
      mem.toDF().toDF("id", "v"), tbl, quar, "gatekeeper", ckpt, gate)
    try {
      mem.addData((1L, 1.0)); q.processAllAvailable() // passes both checks
      mem.addData((2L, -2.0), (3L, 3.0)); q.processAllAvailable() // nonneg_share fails
      assert(VersionedTable.read(spark, tbl).count() == 1)
      val bad = VersionedTable.read(spark, quar).select("_audit_failures")
        .distinct().collect()
      assert(bad.length == 1 && bad(0).getString(0).contains("nonneg_share"))
    } finally q.stop()
  }

  test("a replayed batch publishes once; the replayed stage is aborted") {
    val tmp = java.nio.file.Files.createTempDirectory("auditsink2").toString
    val tbl = tmp + "/tbl"; val quar = tmp + "/quarantine"
    val rows = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    // simulate the foreachBatch body twice for the same batchId
    def deliver(): Option[Long] = {
      val staged = VersionedTable.stageAppend(rows, tbl)
      assert(audit(VersionedTable.readStaged(spark, tbl, staged)).isEmpty)
      val v = VersionedTable.publishStagedBatch(spark, tbl, staged, "w", 7L)
      if (v.isEmpty) VersionedTable.abortStaged(spark, tbl, staged)
      v
    }
    assert(deliver().contains(1L))
    assert(deliver().isEmpty, "replay must not double-append")
    assert(VersionedTable.read(spark, tbl).count() == 2)
    // exactly ONE staging dir survives: the PUBLISHED one (adopted in
    // place, referenced); the replayed stage was aborted — and explicit
    // staging reclamation confirms nothing unreferenced is left
    assert(Option(new java.io.File(s"$tbl/data").list()).getOrElse(Array.empty)
      .count(_.startsWith("staging-")) == 1, "only the adopted stage dir remains")
    assert(VersionedTable.vacuumStaging(
      spark, tbl, System.currentTimeMillis() + 60000) == 0)
  }

  test("an audit that throws aborts the stage and surfaces the error") {
    val tmp = java.nio.file.Files.createTempDirectory("auditsink3").toString
    val tbl = tmp + "/tbl"
    val rows = Seq((1L, 1.0)).toDF("id", "v")
    val staged = VersionedTable.stageAppend(rows, tbl)
    // mirror the sink's throw path by hand
    val boom = intercept[RuntimeException] {
      try { throw new RuntimeException("audit exploded") }
      catch { case t: Throwable =>
        VersionedTable.abortStaged(spark, tbl, staged); throw t }
    }
    assert(boom.getMessage.contains("exploded"))
    assert(!new java.io.File(s"$tbl/data/${staged.id}").exists())
  }
}
