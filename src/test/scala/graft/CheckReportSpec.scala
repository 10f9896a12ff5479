package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** [[VersionedTable.checkReport]] — the dry-run contract audit: exact
  * per-constraint violation counts, -1 for checks the batch cannot
  * evaluate, one aggregation job, nothing written, table unchanged. */
class CheckReportSpec extends SparkSuite {
  import spark.implicits._

  test("per-check violation counts; missing-column checks report -1; table untouched") {
    val path = java.nio.file.Files.createTempDirectory("vt_cr").toString + "/tbl"
    VersionedTable.commitAppend(Seq((1L, 10.0, "a")).toDF("id", "v", "k"), path)
    VersionedTable.addCheck(spark, path, "v_nonneg", "v >= 0")
    VersionedTable.addCheck(spark, path, "id_positive", "id > 0")
    VersionedTable.addCheck(spark, path, "k_known", "k IN ('a','b')")
    val vBefore = VersionedTable.versions(spark, path).last

    val candidate = Seq(
      (2L, 5.0, "a"), (0L, -1.0, "z"), (-3L, 2.0, "b"), (4L, -7.0, "a"))
      .toDF("id", "v", "k")
    assert(VersionedTable.checkReport(spark, path, candidate) == Seq(
      "id_positive" -> 2L, "k_known" -> 1L, "v_nonneg" -> 2L))

    // a batch without the checked column reports -1 for that check only
    val partial = Seq((5L, "a")).toDF("id", "k")
    assert(VersionedTable.checkReport(spark, path, partial) == Seq(
      "id_positive" -> 0L, "k_known" -> 0L, "v_nonneg" -> -1L))

    // dry run: no version created, enforcement on write still fires
    assert(VersionedTable.versions(spark, path).last == vBefore)
    intercept[Exception](VersionedTable.commitAppend(candidate, path))
  }

  test("a table with no checks reports empty") {
    val path = java.nio.file.Files.createTempDirectory("vt_cr0").toString + "/tbl"
    VersionedTable.commitAppend(Seq((1L, 1.0)).toDF("id", "v"), path)
    assert(VersionedTable.checkReport(
      spark, path, Seq((2L, 2.0)).toDF("id", "v")).isEmpty)
  }
}
