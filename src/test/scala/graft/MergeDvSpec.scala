package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Merge-on-read MERGE (`VersionedTable.mergeDV`): equivalence with the
  * copy-on-write merge, zero-rewrite file accounting, point lookups
  * through DV suppression, CDF replay, exactly-once replay, compaction
  * migrating the vectors out. */
class MergeDvSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("vt_mdv").toString + "/tbl"

  private def base = (0 until 100).map(i => (i.toLong, s"row_$i")).toDF("id", "v")

  private def cdc = Seq(
    (10L, "upd_10", false), (20L, "upd_20", false), // updates
    (30L, "del_30", true), // delete
    (500L, "new_500", false) // insert
  ).toDF("id", "v", "_del")

  test("mergeDV result equals copy-on-write merge; zero data files rewritten") {
    val cow = freshDir(); val mor = freshDir()
    VersionedTable.commitAppend(base, cow, Seq("id"))
    VersionedTable.commitAppend(base, mor, Seq("id"))
    VersionedTable.merge(spark, cow, cdc, Seq("id"), deleteFlag = Some("_del"))
    val r = VersionedTable.mergeDV(spark, mor, cdc, Seq("id"), deleteFlag = Some("_del"))
    assert(r.matchedRows == 3L && r.upsertRows == 3L)
    val a = VersionedTable.read(spark, cow).orderBy("id").collect().toSeq
    val b = VersionedTable.read(spark, mor).orderBy("id").collect().toSeq
    assert(a == b, "merge-on-read must produce the same table as copy-on-write")
    // zero rewrite: every v1 data file is still referenced at v2
    val v1Files = VersionedTable.dataFiles(spark, mor, Some(1L)).toSet
    val v2Files = VersionedTable.dataFiles(spark, mor, Some(r.version)).toSet
    assert(v1Files.subsetOf(v2Files), "mergeDV must not remove or rewrite existing files")
    // time travel: the pre-merge snapshot is untouched
    assert(VersionedTable.read(spark, mor, Some(1L)).count() == 100)
  }

  test("point lookups see the DV through blooms: old row suppressed, new row found") {
    val path = freshDir()
    VersionedTable.commitAppend(base, path, Seq("id"), bloomCols = Seq("id"))
    VersionedTable.mergeDV(spark, path, cdc, Seq("id"), deleteFlag = Some("_del"))
    // the bloom still hits the ORIGINAL file for key 10 — the DV anti-join
    // must suppress the stale row and the new file carries the update
    assert(VersionedTable.readKeys(spark, path, "id", Array(10L))
      .select("v").as[String].collect().toSeq == Seq("upd_10"))
    assert(VersionedTable.readKeys(spark, path, "id", Array(30L)).count() == 0)
    assert(VersionedTable.readKeys(spark, path, "id", Array(500L))
      .select("v").as[String].collect().toSeq == Seq("new_500"))
  }

  test("CDF replay across a merge-dv window reproduces the live table") {
    val path = freshDir()
    VersionedTable.commitAppend(base, path, Seq("id"))
    val v1 = VersionedTable.versions(spark, path).last
    VersionedTable.mergeDV(spark, path, cdc, Seq("id"), deleteFlag = Some("_del"))
    val v2 = VersionedTable.versions(spark, path).last
    val feed = VersionedTable.changesWithType(spark, path, v1, v2)
    val replayed = VersionedTable.read(spark, path, Some(v1)).select("id", "v")
      .exceptAll(feed.filter(col("_change_type") === "delete").select("id", "v"))
      .unionAll(feed.filter(col("_change_type") === "insert").select("id", "v"))
    val now = VersionedTable.read(spark, path).select("id", "v")
    assert(replayed.exceptAll(now).isEmpty && now.exceptAll(replayed).isEmpty)
  }

  test("mergeDVBatch replays are no-ops; compaction migrates the vectors out") {
    val path = freshDir()
    VersionedTable.commitAppend(base, path, Seq("id"))
    assert(VersionedTable.mergeDVBatch(
      spark, path, cdc, Seq("id"), "cdc1", 1L, deleteFlag = Some("_del")).isDefined)
    val vAfter = VersionedTable.versions(spark, path).last
    // crash replay: same (writer, batch) -> None, no new version
    assert(VersionedTable.mergeDVBatch(
      spark, path, cdc, Seq("id"), "cdc1", 1L, deleteFlag = Some("_del")).isEmpty)
    assert(VersionedTable.versions(spark, path).last == vAfter)
    val before = VersionedTable.read(spark, path).orderBy("id").collect().toSeq
    // compaction rewrites with DVs applied and retires them
    VersionedTable.compact(spark, path, targetRowsPerFile = 10000)
    assert(VersionedTable.read(spark, path).orderBy("id").collect().toSeq == before)
    // post-compaction files no longer include any pre-compaction data file
    // (full repack), so the DV set must have been pruned with them; a
    // fresh mergeDV still works on the compacted table
    VersionedTable.mergeDV(spark, path,
      Seq((10L, "upd2_10", false)).toDF("id", "v", "_del"), Seq("id"),
      deleteFlag = Some("_del"))
    assert(VersionedTable.read(spark, path).filter(col("id") === 10L)
      .select("v").as[String].collect().toSeq == Seq("upd2_10"))
  }
}
