package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Merge-on-read UPDATE (`VersionedTable.updateWhereDV`): equivalence
  * with the copy-on-write `updateWhere`, zero-rewrite file accounting,
  * CDF delete+insert pairs, NULL-predicate and no-match behavior, and
  * compaction migrating the vectors out with the updates intact. */
class UpdateDvSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("vt_udv").toString + "/tbl"

  private def base = (0 until 100).map(i => (i.toLong, s"row_$i", i * 10L))
    .toDF("id", "v", "amount")

  private val assigns = Map(
    "amount" -> (col("amount") * 2),
    "v" -> concat(col("v"), lit("!")))

  test("updateWhereDV equals copy-on-write updateWhere; zero files rewritten") {
    val cow = freshDir(); val mor = freshDir()
    VersionedTable.commitAppend(base, cow, Seq("id"))
    VersionedTable.commitAppend(base, mor, Seq("id"))
    // scattered predicate: a few rows in every file — the COW worst case
    val (_, nCow) = VersionedTable.updateWhere(spark, cow, col("id") % 10 === 3, assigns)
    val (v2, nMor) = VersionedTable.updateWhereDV(spark, mor, col("id") % 10 === 3, assigns)
    assert(nCow == 10L && nMor == 10L)
    val a = VersionedTable.read(spark, cow).orderBy("id").collect().toSeq
    val b = VersionedTable.read(spark, mor).orderBy("id").collect().toSeq
    assert(a == b, "merge-on-read update must produce the same table as copy-on-write")
    assert(b.count(_.getString(1).endsWith("!")) == 10)
    // zero rewrite: every v1 data file still referenced at v2
    val v1Files = VersionedTable.dataFiles(spark, mor, Some(1L)).toSet
    val v2Files = VersionedTable.dataFiles(spark, mor, Some(v2)).toSet
    assert(v1Files.subsetOf(v2Files), "updateWhereDV must not remove or rewrite files")
  }

  test("CDF window replays the update as delete+insert pairs") {
    val tbl = freshDir()
    VersionedTable.commitAppend(base, tbl, Seq("id"))
    VersionedTable.updateWhereDV(spark, tbl, col("id") < 5, assigns)
    val cdf = VersionedTable.changesWithType(spark, tbl, 1L, 2L)
    val byType = cdf.groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(byType == Map("delete" -> 5L, "insert" -> 5L))
    // the insert side carries the UPDATED values
    val ins = cdf.filter(col("_change_type") === "insert")
      .orderBy("id").select("amount").as[Long].collect().toSeq
    assert(ins == Seq(0L, 20L, 40L, 60L, 80L))
  }

  test("no-match is a version no-op; NULL predicate rows are not updated") {
    val tbl = freshDir()
    VersionedTable.commitAppend(
      Seq((1L, "a", Some(5L)), (2L, "b", None)).toDF("id", "v", "amount"), tbl)
    val (v, n) = VersionedTable.updateWhereDV(spark, tbl, col("id") > 100, assigns)
    assert(v == 1L && n == 0L)
    // amount IS NULL makes the predicate NULL: row must survive untouched
    val (_, n2) = VersionedTable.updateWhereDV(spark, tbl, col("amount") > 1, assigns)
    assert(n2 == 1L)
    val rows = VersionedTable.read(spark, tbl).orderBy("id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(rows == Seq((1L, "a!", Some(10L)), (2L, "b", None)))
  }

  test("repeated DV updates compose; compaction migrates the vectors out") {
    val tbl = freshDir()
    VersionedTable.commitAppend(base, tbl, Seq("id"))
    VersionedTable.updateWhereDV(spark, tbl, col("id") === 7, Map("amount" -> lit(1L)))
    VersionedTable.updateWhereDV(spark, tbl, col("id") === 7, Map("amount" -> (col("amount") + 1)))
    def row7() = VersionedTable.read(spark, tbl).filter(col("id") === 7)
      .select("amount").as[Long].collect().toSeq
    assert(row7() == Seq(2L))
    assert(VersionedTable.read(spark, tbl).count() == 100L)
    VersionedTable.compact(spark, tbl, 1000L)
    assert(row7() == Seq(2L))
    assert(VersionedTable.read(spark, tbl).count() == 100L)
  }
}
