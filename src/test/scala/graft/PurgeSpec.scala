package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Contracts of the history-rewrite erasure purge
  * ([[VersionedTable.purgeWhere]]): purged rows physically gone from
  * every version AND every sidecar payload, every other row of every
  * version bit-identical (deletion-vector state included), manifests
  * consistent (row counts, stats), and purge scoped to affected files.
  */
@org.scalatest.tags.Slow
class PurgeSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("purge_spec").toFile
    d.deleteOnExit()
    d.toString + "/tbl"
  }

  private def base = spark.range(0, 1000)
    .select(
      col("id").as("k"),
      (col("id") % 7).as("user_id"),
      (col("id") * 10).cast("double").as("amount"))

  test("purge erases the subject from every version, other rows untouched") {
    val path = freshDir()
    VersionedTable.commitAppend(base.filter(col("k") < 600), path, "k")
    VersionedTable.deleteWhereDV(spark, path, col("k") % 10 === 0)
    VersionedTable.commitAppend(base.filter(col("k") >= 600), path, "k")

    // expected per-version states BEFORE the purge, with the subject removed
    val expected = (1L to 3L).map { v =>
      v -> VersionedTable.read(spark, path, Some(v))
        .filter(col("user_id") =!= 3)
        .collect().map(_.toSeq).toSet
    }.toMap

    val res = VersionedTable.purgeWhere(spark, path, col("user_id") === 3)
    assert(res.rowsPurged > 0)
    assert(res.versionsEdited == 3)
    assert(res.dvFilesRewritten >= 1) // user 3 has k%10==0 members in the DV

    (1L to 3L).foreach { v =>
      val got = VersionedTable.read(spark, path, Some(v)).collect().map(_.toSeq).toSet
      assert(got == expected(v), s"version $v drifted after purge")
    }
  }

  test("no physical byte of the subject survives anywhere under data/") {
    val path = freshDir()
    VersionedTable.commitAppend(base.filter(col("k") < 600), path, "k")
    VersionedTable.deleteWhereDV(spark, path, col("k") % 10 === 0) // CDF carries payloads
    VersionedTable.updateWhere(
      spark, path, col("k") % 100 === 3,
      Map("amount" -> (col("amount") * 2))) // more CDF payloads, incl. user 3
    VersionedTable.commitAppend(base.filter(col("k") >= 600), path, "k")

    VersionedTable.purgeWhere(spark, path, col("user_id") === 3)

    // raw sweep of EVERY parquet file under data/ (data, CDF, DV, blooms):
    // no file with a user_id column may hold user 3
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    val files = walk(new java.io.File(path + "/data"))
    assert(files.nonEmpty)
    files.foreach { pf =>
      val df = spark.read.parquet(pf.toString)
      if (df.columns.contains("user_id")) {
        val hits = df.filter(col("user_id") === 3).count()
        assert(hits == 0L, s"purged rows survive in ${pf.getName}")
      }
    }
  }

  test("manifest row counts and countRows stay consistent after purge") {
    val path = freshDir()
    VersionedTable.commitAppend(base, path, "k")
    VersionedTable.deleteWhereDV(spark, path, col("k") >= 990)
    VersionedTable.purgeWhere(spark, path, col("user_id") === 0)
    (1L to 2L).foreach { v =>
      val scanned = VersionedTable.read(spark, path, Some(v)).count()
      assert(VersionedTable.countRows(spark, path, Some(v)) == scanned, s"countRows drift at v$v")
    }
  }

  test("manifest min/max stats are recomputed, not leaking purged extremes") {
    val path = freshDir()
    // subject owns the global max key (999 -> user 999%7==5)
    VersionedTable.commitAppend(base, path, "k")
    VersionedTable.purgeWhere(spark, path, col("user_id") === 5)
    // stats-pruned range read for the purged max key must admit zero files
    val files = VersionedTable.filesForRanges(spark, path, Map("k" -> (999L, 999L)))
    assert(files.isEmpty, s"stale stats still admit the purged max key: $files")
    // a surviving key still resolves through the same pruned path
    assert(VersionedTable.readWhere(spark, path, "k", 998L, 998L).count() == 1L)
  }

  test("purge leaves unaffected files in place (no full-table rewrite)") {
    val path = freshDir()
    // two commits; the subject lives only in the first
    VersionedTable.commitAppend(base.filter(col("k") < 100), path, "k")
    VersionedTable.commitAppend(
      base.filter(col("k") >= 100).withColumn("user_id", lit(99L)), path, "k")
    val before = VersionedTable.dataFiles(spark, path).toSet
    val res = VersionedTable.purgeWhere(spark, path, col("user_id") =!= 99)
    val after = VersionedTable.dataFiles(spark, path).toSet
    assert(res.dataFilesRewritten >= 1)
    // second commit's files carry by reference
    assert((before & after).nonEmpty, "untouched files were rewritten")
  }

  test("no-match purge is a no-op") {
    val path = freshDir()
    VersionedTable.commitAppend(base, path, "k")
    val res = VersionedTable.purgeWhere(spark, path, col("user_id") === 42)
    assert(res == VersionedTable.PurgeResult(0L, 0, 0, 0, 0))
  }

  test("purge refuses predicates over renamed columns") {
    val path = freshDir()
    VersionedTable.commitAppend(base, path, "k")
    VersionedTable.renameColumn(spark, path, "user_id", "uid")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.purgeWhere(spark, path, col("uid") === 3)
    }
    assert(e.getMessage.contains("renamed"))
  }

  test("CDF replay after purge: subject gone, other change rows intact") {
    val path = freshDir()
    VersionedTable.commitAppend(base, path, "k")
    VersionedTable.deleteWhereDV(spark, path, col("k") % 10 === 0)
    val before = VersionedTable.changesWithType(spark, path, 1L, 2L)
      .filter(col("user_id") =!= 3)
      .collect().map(_.toSeq).toSet
    VersionedTable.purgeWhere(spark, path, col("user_id") === 3)
    val after = VersionedTable.changesWithType(spark, path, 1L, 2L)
    assert(after.filter(col("user_id") === 3).count() == 0L,
      "purged rows still replay through the change feed")
    assert(after.filter(col("user_id") =!= 3).collect().map(_.toSeq).toSet == before,
      "non-subject change rows drifted")
  }

  test("stream replay after purge never surfaces the subject") {
    val root = Files.createTempDirectory("purge_stream").toString
    val path = s"$root/tbl"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    VersionedTable.commitAppend(base.filter(col("k") < 500), path, "k")
    VersionedTable.commitAppend(base.filter(col("k") >= 500), path, "k")
    VersionedTable.purgeWhere(spark, path, col("user_id") === 2)
    // fresh checkpoint: the source bootstraps from v1 and tails v2 —
    // both micro-batches must read the REWRITTEN files
    val q = spark.readStream.format("graft-vt-stream").option("path", path)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.filter(col("user_id") === 2).count() == 0L,
      "purged rows replayed through the stream source")
    assert(got.count() == base.filter(col("user_id") =!= 2).count())
  }

  test("bloom pruning degrades safely after purge and compact restores it") {
    val path = freshDir()
    VersionedTable.commitAppend(base, path, Seq("k"), Seq("k"))
    VersionedTable.purgeWhere(spark, path, col("user_id") === 5)
    // rewritten files lost their bloom entries (old names) -> uncovered ->
    // point reads scan them instead of skipping: correct, just unpruned
    assert(VersionedTable.readKeys(spark, path, "k", Array(998L)).count() == 1L)
    assert(VersionedTable.readKeys(spark, path, "k", Array(999L)).count() == 0L) // 999%7==5: purged
    VersionedTable.compact(spark, path, targetRowsPerFile = 500L)
    // compact re-blooms the files it stages -> coverage is back
    val pruned = VersionedTable.filesForKeys(spark, path, "k", Array(998L))
    assert(pruned.isDefined && pruned.get.nonEmpty, "bloom coverage not restored by compact")
    assert(VersionedTable.readKeys(spark, path, "k", Array(998L)).count() == 1L)
    assert(VersionedTable.readKeys(spark, path, "k", Array(999L)).count() == 0L)
  }

  test("purgeKeys erases listed keys and NULL-predicate rows survive") {
    val path = freshDir()
    val withNulls = base.withColumn(
      "user_id", when(col("k") % 11 === 0, lit(null)).otherwise(col("user_id")))
    VersionedTable.commitAppend(withNulls, path, "k")
    VersionedTable.purgeKeys(spark, path, "k", Seq(5L, 6L, 7L))
    val head = VersionedTable.read(spark, path)
    assert(head.filter(col("k").isin(5L, 6L, 7L)).count() == 0L)
    // NULL user_id rows survive a user_id predicate purge (3VL policy)
    VersionedTable.purgeWhere(spark, path, col("user_id") === 1)
    val after = VersionedTable.read(spark, path)
    assert(after.filter(col("user_id").isNull).count() == withNulls.filter(col("user_id").isNull).count())
    assert(after.filter(col("user_id") === 1).count() == 0L)
  }
}
