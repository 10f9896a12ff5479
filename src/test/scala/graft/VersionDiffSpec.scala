package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.VersionDiff

/** Contract of [[VersionDiff]]: net per-key classification across a
  * multi-commit window — added / removed / changed / rewritten_same —
  * with transient keys dropped, and the summary's per-column change
  * counts null-safe. (q229's oracle re-checks the summary arithmetic on
  * the orders fixture; here every status branch is forced explicitly.)
  */
class VersionDiffSpec extends SparkSuite {

  private def freshDir(): String = {
    val p = java.nio.file.Files.createTempDirectory("vdiff").toFile
    p.deleteOnExit()
    p.toString + "/tbl"
  }

  test("per-key statuses: added, removed, changed, rewritten_same, transient dropped") {
    import spark.implicits._
    val path = freshDir()
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val v0 = VersionedTable.commitAppend(base, path)
    // commit 1: change k=1's v; delete k=2; insert k=5 (will be deleted
    // again -> transient); rewrite k=3 with IDENTICAL values
    val m1 = Seq(
      (1L, "a", 11.0, false),
      (2L, "b", 20.0, true),
      (5L, "e", 50.0, false),
      (3L, "c", 30.0, false))
      .toDF("k", "s", "v", "_del")
    VersionedTable.merge(spark, path, m1, Seq("k"), deleteFlag = Some("_del"))
    // commit 2: delete the k=5 just inserted; insert k=6
    val m2 = Seq((5L, "e", 50.0, true), (6L, "f", 60.0, false))
      .toDF("k", "s", "v", "_del")
    VersionedTable.merge(spark, path, m2, Seq("k"), deleteFlag = Some("_del"))
    val vN = VersionedTable.versions(spark, path).last

    val got = VersionDiff.perKey(spark, path, v0, vN, Seq("k"))
      .select("k", "status")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(got == Map(1L -> "changed", 2L -> "removed", 3L -> "rewritten_same",
      6L -> "added"))
    assert(!got.contains(5L), "transient key must net to nothing")
    assert(!got.contains(4L), "untouched key must not appear in the diff")

    val sum = VersionDiff.summary(spark, path, v0, vN, Seq("k")).collect().head
    val byName = sum.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> sum.getLong(i) }.toMap
    assert(byName == Map(
      "n_added" -> 1L, "n_removed" -> 1L, "n_changed" -> 1L, "n_rewritten_same" -> 1L,
      "chg_s" -> 0L, "chg_v" -> 1L))
  }

  test("before/after payloads: null on the absent side, null-safe column compare") {
    import spark.implicits._
    val path = freshDir()
    val base = Seq((1L, Some("x"), 1.0), (2L, None: Option[String], 2.0))
      .toDF("k", "s", "v")
    val v0 = VersionedTable.commitAppend(base, path)
    // k=1: s goes non-null -> null (must count as a change in chg_s);
    // k=2: s stays null while v changes (chg_s must NOT count it)
    val m = Seq(
      (1L, None: Option[String], 1.0, false),
      (2L, None: Option[String], 2.5, false))
      .toDF("k", "s", "v", "_del")
    VersionedTable.merge(spark, path, m, Seq("k"), deleteFlag = Some("_del"))
    val vN = VersionedTable.versions(spark, path).last

    val pk = VersionDiff.perKey(spark, path, v0, vN, Seq("k")).collect()
    val one = pk.find(_.getLong(0) == 1L).get
    assert(one.getString(pk.head.fieldIndex("status")) == "changed")
    val sum = VersionDiff.summary(spark, path, v0, vN, Seq("k")).collect().head
    val byName = sum.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> sum.getLong(i) }.toMap
    assert(byName("n_changed") == 2L)
    assert(byName("chg_s") == 1L)
    assert(byName("chg_v") == 1L)
  }

  test("empty window yields an all-zero summary") {
    import spark.implicits._
    val path = freshDir()
    val v0 = VersionedTable.commitAppend(Seq((1L, 1.0)).toDF("k", "v"), path)
    val sum = VersionDiff.summary(spark, path, v0, v0, Seq("k")).collect().head
    assert((0 until sum.length).forall(sum.getLong(_) == 0L))
  }
}
