package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Typed (stats3) manifest file-skipping — VERDICT r15 item 4: string /
  * date / timestamp keys prune at the manifest level where the long-only
  * channel recorded nothing. Pins: positive pruning selectivity on a
  * range-clustered string key, the stats-less-file safety rule, the
  * date and timestamp channels (timestamp keeps its long-seconds stats2
  * entry TOO), carry through compaction, the dropColumn guard, and the
  * purge bound refresh (a purged doc id must not survive in the
  * manifest's recorded bounds). */
class TypedStatsSpec extends SparkSuite {
  import spark.implicits._

  private def scratch(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"typedstats_$name").toFile
    p.deleteOnExit()
    p.toString + "/tbl"
  }

  test("string key: range-clustered files prune to the matching subset; stats-less file survives") {
    val path = scratch("str")
    val docs = (0 until 400).map(i => (f"doc$i%05d", i.toLong)).toDF("doc_id", "v")
    VersionedTable.commitAppend(
      docs.repartitionByRange(8, col("doc_id")), path, Seq("doc_id"))
    val all = VersionedTable.filesForRangesTyped(
      spark, path, Map("doc_id" -> ("doc00000", "doc99999")))
    assert(all.size == 8)
    val keep = VersionedTable.filesForRangesTyped(
      spark, path, Map("doc_id" -> ("doc00100", "doc00149")))
    assert(keep.nonEmpty && keep.size <= 2,
      s"a 50-key slice of 400 range-clustered keys must prune to <=2 of 8 files, kept ${keep.size}")
    val rows = VersionedTable.readWhereString(spark, path, "doc_id", "doc00100", "doc00149")
    assert(rows.count() == 50)
    assert(rows.agg(min("doc_id"), max("doc_id")).head.toSeq ==
      Seq("doc00100", "doc00149"))
    // out-of-domain range: zero files, empty frame with the right schema
    val none = VersionedTable.readWhereString(spark, path, "doc_id", "zzz", "zzzz")
    assert(none.count() == 0 && none.columns.toSeq == Seq("doc_id", "v"))
    // a stats-less commit's file has no entries and must ALWAYS survive
    VersionedTable.commitAppend(
      Seq(("doc00120", 9999L)).toDF("doc_id", "v"), path)
    val keep2 = VersionedTable.filesForRangesTyped(
      spark, path, Map("doc_id" -> ("doc00100", "doc00149")))
    assert(keep2.size == keep.size + 1, "the stats-less file must be kept")
    val rows2 = VersionedTable.readWhereString(spark, path, "doc_id", "doc00100", "doc00149")
    assert(rows2.count() == 51)
    assert(rows2.filter(col("v") === 9999L).count() == 1)
  }

  test("date and timestamp keys prune typed; timestamp keeps its long-seconds channel too") {
    val path = scratch("dt")
    val rows = (0 until 200).map { i =>
      (i.toLong, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        new Timestamp(1700000000000L + i * 3600L * 1000L))
    }.toDF("id", "d", "ts")
    VersionedTable.commitAppend(
      rows.repartitionByRange(8, col("id")), path, Seq("id", "d", "ts"))
    // date: a 10-day slice keeps a strict subset of the 8 files
    val keepD = VersionedTable.filesForRangesTyped(
      spark, path, Map("d" -> (Date.valueOf("2024-03-01"), Date.valueOf("2024-03-10"))))
    assert(keepD.nonEmpty && keepD.size < 8, s"kept ${keepD.size} of 8")
    val gotD = VersionedTable.readWhereTyped(
      spark, path, Map("d" -> (Date.valueOf("2024-03-01"), Date.valueOf("2024-03-10"))))
    assert(gotD.count() == 10)
    // ISO-string date bounds are accepted too
    assert(VersionedTable.readWhereTyped(
      spark, path, Map("d" -> ("2024-03-01", "2024-03-10"))).count() == 10)
    // timestamp via Instant bounds at micros precision
    val t0 = java.time.Instant.ofEpochMilli(1700000000000L + 50L * 3600_000L)
    val t1 = java.time.Instant.ofEpochMilli(1700000000000L + 59L * 3600_000L)
    val keepT = VersionedTable.filesForRangesTyped(spark, path, Map("ts" -> (t0, t1)))
    assert(keepT.nonEmpty && keepT.size < 8, s"kept ${keepT.size} of 8")
    assert(VersionedTable.readWhereTyped(spark, path, Map("ts" -> (t0, t1))).count() == 10)
    // the long channel still carries the timestamp in SECONDS: the
    // pre-existing readWhere surface keeps working unchanged
    val sec0 = 1700000000L + 50L * 3600L
    val sec1 = 1700000000L + 59L * 3600L
    assert(VersionedTable.readWhere(spark, path, "ts", sec0, sec1).count() == 10)
    assert(VersionedTable.filesForRanges(
      spark, path, Map("ts" -> (sec0, sec1))).size < 8)
    // mixed predicate: typed string/date plus a LONG id bound in one call
    assert(VersionedTable.readWhereTyped(spark, path,
      Map("d" -> (Date.valueOf("2024-03-01"), Date.valueOf("2024-03-10")),
        "id" -> (0L, 1000L))).count() == 10)
  }

  test("typed stats survive compaction and refresh tight; dropColumn refuses on a typed stats col") {
    val path = scratch("cmp")
    val docs = (0 until 300).map(i => (f"k$i%05d", i.toLong)).toDF("doc_id", "v")
    // two interleaved commits -> wide per-file ranges
    VersionedTable.commitAppend(docs.filter(col("v") % 2 === 0), path, Seq("doc_id"))
    VersionedTable.commitAppend(docs.filter(col("v") % 2 === 1), path, Seq("doc_id"))
    VersionedTable.compact(spark, path, targetRowsPerFile = 100L)
    val keep = VersionedTable.filesForRangesTyped(
      spark, path, Map("doc_id" -> ("k00000", "k00049")))
    val all = VersionedTable.filesForRangesTyped(
      spark, path, Map("doc_id" -> ("k00000", "k99999")))
    assert(all.size >= 3, s"compaction should leave >=3 files, got ${all.size}")
    assert(keep.size < all.size,
      s"post-compaction typed stats must stay selective: kept ${keep.size}/${all.size}")
    assert(VersionedTable.readWhereString(spark, path, "doc_id", "k00000", "k00049")
      .count() == 50)
    val e = intercept[IllegalArgumentException](
      VersionedTable.dropColumn(spark, path, "doc_id"))
    assert(e.getMessage.contains("file-skipping stats"), e.getMessage)
  }

  test("purge refreshes typed bounds: a purged boundary doc id no longer appears in the manifest") {
    val path = scratch("purge")
    val docs = (0 until 100).map(i => (f"p$i%05d", i.toLong)).toDF("doc_id", "v")
    VersionedTable.commitAppend(
      docs.repartitionByRange(4, col("doc_id")), path, Seq("doc_id"))
    // purge the global max key: its value sat in some file's recorded hi
    VersionedTable.purgeWhere(spark, path, col("doc_id") === "p00099")
    val texts = VersionedTable.versions(spark, path).map { v =>
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        path, "_versions", f"v$v%010d.json")), "UTF-8")
    }
    val b64 = java.util.Base64.getEncoder.encodeToString("p00099".getBytes("UTF-8"))
    texts.foreach(t => assert(!t.contains(b64),
      "the purged id must not survive in any manifest's typed bounds"))
    assert(VersionedTable.read(spark, path).count() == 99)
    assert(VersionedTable.readWhereString(spark, path, "doc_id", "p00090", "p00099")
      .count() == 9)
  }

  test("string bucket key: a point lookup cuts to the key's single bucket file") {
    val path = scratch("bpt")
    val docs = (0 until 400).map(i => (f"doc$i%05d", i.toLong)).toDF("doc_id", "v")
    VersionedTable.commitBucketed(docs, path, "doc_id", 8)
    val got = VersionedTable.readWhereTyped(
      spark, path, Map("doc_id" -> ("doc00123", "doc00123")))
    assert(got.count() == 1 && got.head.getAs[Long]("v") == 123L)
    assert(got.inputFiles.length == 1,
      s"point lookup on a string bucket key must read 1 of 8 files, read ${got.inputFiles.length}")
    // a RANGE (not a point) cannot use the claim: all files survive
    val range = VersionedTable.readWhereTyped(
      spark, path, Map("doc_id" -> ("doc00100", "doc00149")))
    assert(range.count() == 50 && range.inputFiles.length == 8)
  }

  test("merge candidate pruning cuts on STRING keys through the typed channel") {
    val path = scratch("mrg")
    val docs = (0 until 400).map(i => (f"doc$i%05d", i.toLong)).toDF("doc_id", "v")
    VersionedTable.commitAppend(
      docs.repartitionByRange(8, col("doc_id")), path, Seq("doc_id"))
    val batch = Seq(("doc00123", 999L), ("doc00130", 998L)).toDF("doc_id", "v")
    val r = VersionedTable.merge(spark, path, batch, Seq("doc_id"))
    assert(r.filesRewritten <= 2 && r.filesKept >= 6,
      s"a 2-key batch on 8 range-clustered files must rewrite <=2: $r")
    val vals = VersionedTable.read(spark, path)
      .filter(col("doc_id").isin("doc00123", "doc00130"))
      .orderBy("doc_id").select("v").collect().map(_.getLong(0)).toSeq
    assert(vals == Seq(999L, 998L))
    assert(VersionedTable.read(spark, path).count() == 400)
  }

  test("DESCRIBE DETAIL reports both pruning channels; statsColumns is the API") {
    spark.conf.set("spark.sql.catalog.vtts", classOf[graft.sources.VtCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("vt_ts_sql").toString
    spark.conf.set("spark.sql.catalog.vtts.warehouse", wh)
    val path = s"$wh/docs"
    val docs = (0 until 50).map(i => (f"d$i%04d", i.toLong)).toDF("doc_id", "v")
    VersionedTable.commitAppend(docs, path, Seq("doc_id", "v"))
    val (longCols, typedCols) = VersionedTable.statsColumns(spark, path)
    assert(longCols == Seq("v") && typedCols == Map("doc_id" -> "string"))
    val d = spark.sql(s"DESCRIBE DETAIL vtts.`$path`").collect()(0)
    assert(d.getAs[String]("stats_columns") == "v:long, doc_id:string", d.toString)
    // a stats-less table says so
    val plain = s"$wh/plain"
    VersionedTable.commitAppend(docs, plain)
    assert(spark.sql(s"DESCRIBE DETAIL vtts.`$plain`").collect()(0)
      .getAs[String]("stats_columns") == "none")
  }
}
