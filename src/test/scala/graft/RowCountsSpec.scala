package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Metadata-only row accounting (`VersionedTable.countRows`): counts from
  * the manifest with zero data-file opens (proved by counting after the
  * data files are gone), DV subtraction, scan fallback on partial
  * coverage, compaction restoring coverage. */
class RowCountsSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("vt_rows").toString + "/tbl"

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"row_$i")).toDF("id", "v")

  test("counts come from the manifest alone — they survive the data files being deleted") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 500), path, Seq("id"))
    VersionedTable.commitAppend(batch(500, 800), path, Seq("id"))
    assert(VersionedTable.countRows(spark, path) == 800L)
    assert(VersionedTable.countRows(spark, path, Some(1L)) == 500L)
    // the zero-I/O proof: remove every data file; the count still answers
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/data"), true)
    assert(VersionedTable.countRows(spark, path) == 800L,
      "countRows opened a data file it promised not to need")
  }

  test("deletion vectors subtract via the sidecar; copy-on-write deletes stay exact") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 400), path, Seq("id"))
    VersionedTable.deleteWhereDV(spark, path, col("id") % 4 === 0)
    assert(VersionedTable.countRows(spark, path) == 300L)
    assert(VersionedTable.countRows(spark, path, Some(1L)) == 400L,
      "time travel must count the pre-delete snapshot")
  }

  test("stats-free appends degrade to an honest scan; compaction restores the fast path") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 100), path, Seq("id"))
    VersionedTable.commitAppend(batch(100, 150), path) // no stats: no count entry
    assert(VersionedTable.countRows(spark, path) == 150L) // fallback scan, still right
    VersionedTable.compact(spark, path, targetRowsPerFile = 10000)
    // full coverage again: metadata-only (same deletion proof)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val latest = VersionedTable.versions(spark, path).last
    VersionedTable.dataFiles(spark, path, Some(latest)).foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false)
    }
    assert(VersionedTable.countRows(spark, path) == 150L)
  }
}
