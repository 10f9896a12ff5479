package graft

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.sources.{MediaFixture, MediaTable}

/** DataSource V2 `graft-media` contract: planning-time filter pushdown
  * (pruned files are never opened), header-only column pruning, bounded
  * input partitions, and row correctness vs the in-memory parsers. */
class MediaSourceSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = MediaFixture.ensure(spark, sf0001)

  /** All physical nodes, descending through AQE wrappers (a grouped or
    * sorted query plans an exchange, so AQE wraps it). */
  private def flatPlan(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] =
    df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case p => p }
      case p => Seq(p)
    }.flatten

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    flatPlan(df).collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("round-trip: source rows match the in-memory container parses") {
    val viaSource = spark.read.format("graft-media").load(dir)
      .select("doc_id", "format", "width", "height", "channels")
      .orderBy("doc_id")
      .as[(Long, String, Int, Int, Int)].collect().toSeq
    val direct = Multimodal.imageMetadata(
      spark,
      Multimodal.imagesFromDocuments(spark, graft.core.Tables.documents(spark, sf0001)))
      .toDF().orderBy("doc_id")
      .select("doc_id", "format", "width", "height", "channels")
      .as[(Long, String, Int, Int, Int)].collect().toSeq
    assert(viaSource.nonEmpty && viaSource == direct)
  }

  test("format/doc_id filters are pushed: consumed by the scan, files pruned at planning") {
    val df = spark.read.format("graft-media").load(dir)
      .filter(col("format") === "png" && col("doc_id") < 100)
      .select("doc_id", "n_bytes")
    val scan = scanOf(df)
    // fully consumed: no residual FilterExec survives above the scan
    assert(df.queryExecution.executedPlan.collectFirst { case f: FilterExec => f }.isEmpty)
    assert(scan.scan.description().contains("format"))
    assert(scan.scan.description().contains("doc_id"))
    // planning-time pruning: partitions carry only matching files
    val files = scan.inputRDDs().head.partitions.length
    val kept = df.count()
    val total = MediaTable.listFiles(dir).size
    assert(kept == MediaTable.listFiles(dir).count(m => m.format == "png" && m.docId < 100))
    assert(kept < total, "filter should prune files")
  }

  test("limit pushdown prunes the planning-time file list to N files") {
    val df = spark.read.format("graft-media").load(dir)
      .filter(col("format") === "png")
      .select("doc_id", "format")
      .limit(3)
    val rows = df.collect()
    assert(rows.length == 3)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("PushedLimit: 3"),
      s"limit not pushed:\n${scan.scan.description()}")
    // 1 file == 1 row: the scan must plan exactly the limited file set —
    // composed AFTER the pushed filter, and deterministic (docId-sorted
    // listing), so it's the three smallest matching doc_ids.
    val planned = scan.scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.MediaInputPartition].files.length).sum
    assert(planned == 3, s"planned $planned files for LIMIT 3")
    val expected = MediaTable.listFiles(dir).filter(_.format == "png")
      .sortBy(_.docId).take(3).map(_.docId)
    assert(rows.map(_.getLong(0)).sorted.toSeq == expected)
  }

  test("column pruning reaches the scan: metadata-only read schema drops media") {
    val df = spark.read.format("graft-media").load(dir).select("doc_id", "format", "n_bytes")
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSet == Set("doc_id", "format", "n_bytes"))
    // n_bytes must be the true on-storage container size even though the
    // reader fetched at most a 64-byte header prefix per file
    val viaSource = df.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val expected = MediaTable.listFiles(dir).map(m => (m.docId, m.format, m.nBytes))
    assert(viaSource == expected)
  }

  test("graft-media resolves through the session catalog (CREATE TABLE USING)") {
    spark.sql(
      s"CREATE TABLE media_cat USING `graft-media` OPTIONS (path '$dir')")
    try {
      val n = spark.sql("SELECT count(*) FROM media_cat WHERE format = 'png'")
        .collect()(0).getLong(0)
      assert(n == MediaTable.listFiles(dir).count(_.format == "png"))
      // pushdown works through the catalog path too
      val df = spark.table("media_cat").filter(col("format") === "png").select("doc_id")
      assert(scanOf(df).scan.description().contains("format"))
    } finally spark.sql("DROP TABLE media_cat")
  }

  test("DSv2 write: save -> load round-trips payloads; overwrite truncates stale files") {
    val out = java.nio.file.Files.createTempDirectory("media_write").toString
    val docs = graft.core.Tables.documents(spark, sf0001).limit(50)
    val media = Multimodal.imagesFromDocuments(spark, docs).toDF()
    media.write.format("graft-media").mode("append").save(out)
    val back = spark.read.format("graft-media").load(out)
      .select("doc_id", "media").orderBy("doc_id")
      .as[(Long, Array[Byte])].collect().toSeq
    val orig = media.orderBy("doc_id").as[(Long, Array[Byte])].collect().toSeq
    assert(back.size == orig.size && back.size == 50)
    back.zip(orig).foreach { case ((bid, bb), (oid, ob)) =>
      assert(bid == oid && java.util.Arrays.equals(bb, ob))
    }
    // overwrite with a disjoint subset truncates the first write's files
    val media2 = Multimodal.imagesFromDocuments(
      spark, graft.core.Tables.documents(spark, sf0001)
        .filter(col("doc_id").between(100, 109)))
      .toDF()
    media2.write.format("graft-media").mode("overwrite").save(out)
    val ids = spark.read.format("graft-media").load(out)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == (100L to 109L))
  }

  test("aggregate pushdown: grouped agg answered from the listing, no aggregate exec planned") {
    val df = spark.read.format("graft-media").load(dir)
      .groupBy("format")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("bytes"),
        min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("format")
    val scan = scanOf(df)
    assert(scan.scan.description().contains("PushedAggregation"),
      s"aggregation not pushed:\n${scan.scan.description()}")
    // complete pushdown: Spark plans NO aggregate at all — the scan rows ARE final
    val aggExecs = flatPlan(df).collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggExecs.isEmpty, s"expected no aggregate exec, found:\n$aggExecs")
    val got = df.as[(String, Long, Long, Long, Long)].collect().toSeq
    val expected = MediaTable.listFiles(dir).groupBy(_.format).toSeq.sortBy(_._1)
      .map { case (f, ms) =>
        (f, ms.size.toLong, ms.map(_.nBytes).sum, ms.map(_.docId).min, ms.map(_.docId).max)
      }
    assert(got == expected)
  }

  test("aggregate pushdown composes with pushed filters; empty matches keep SQL semantics") {
    val filtered = spark.read.format("graft-media").load(dir)
      .filter(col("format") === "png" && col("doc_id") < 100)
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("bytes"))
    assert(scanOf(filtered).scan.description().contains("PushedAggregation"))
    val pngs = MediaTable.listFiles(dir).filter(m => m.format == "png" && m.docId < 100)
    assert(filtered.as[(Long, Long)].collect().toSeq ==
      Seq((pngs.size.toLong, pngs.map(_.nBytes).sum)))
    // global aggregate over zero matching files: one row, count 0, null sum
    val empty = spark.read.format("graft-media").load(dir)
      .filter(col("format") === "gif")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("bytes"))
    assert(empty.collect().toSeq.map(r => (r.getLong(0), r.isNullAt(1))) == Seq((0L, true)))
    // grouped aggregate over zero matching files: zero rows
    val emptyGrouped = spark.read.format("graft-media").load(dir)
      .filter(col("format") === "gif")
      .groupBy("format").agg(count(lit(1)).as("n"))
    assert(emptyGrouped.collect().isEmpty)
  }

  test("a residual (header-column) filter disables aggregate pushdown and stays correct") {
    val df = spark.read.format("graft-media").load(dir)
      .filter(col("width") > 0) // width needs a header parse -> not pushable
      .groupBy("format").agg(count(lit(1)).as("n"))
      .orderBy("format")
    assert(!scanOf(df).scan.description().contains("PushedAggregation"))
    val expected = MediaTable.listFiles(dir).groupBy(_.format).toSeq.sortBy(_._1)
      .map { case (f, ms) => (f, ms.size.toLong) } // every fixture file has width > 0
    assert(df.as[(String, Long)].collect().toSeq == expected)
  }

  test("file list splits into bounded input partitions in doc_id order") {
    val df = spark.read.format("graft-media")
      .option("filesPerPartition", "100").load(dir)
      .select("doc_id")
    val scan = scanOf(df)
    val total = MediaTable.listFiles(dir).size
    val expectedParts = (total + 99) / 100
    assert(scan.inputRDDs().head.getNumPartitions == expectedParts)
    assert(df.count() == total)
  }
}
