package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** CHECK constraints on the versioned table: add-time validation of
  * existing data, refusal of violating writes on every write path
  * (append, stream batch, merge, replaceWhere, overwrite), NULL-passes
  * semantics, carry-forward through maintenance and overwrite, drop. */
class TableChecksSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("vt_checks").toString + "/tbl"

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"row_$i")).toDF("id", "v")

  test("add validates existing data; violating appends refuse atomically; clean ones land") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 50), path)
    // existing data violates -> refused, no version consumed
    intercept[VersionedTable.CheckViolationException] {
      VersionedTable.addCheck(spark, path, "small_ids", "id < 10")
    }
    assert(VersionedTable.versions(spark, path) == Seq(1L))
    // a satisfiable check lands as a metadata-only commit
    VersionedTable.addCheck(spark, path, "nonneg_id", "id >= 0")
    assert(VersionedTable.checks(spark, path) == Seq("nonneg_id" -> "id >= 0"))
    // violating append: whole commit refused, table unchanged
    val before = VersionedTable.versions(spark, path)
    intercept[VersionedTable.CheckViolationException] {
      VersionedTable.commitAppend(Seq((-1L, "bad")).toDF("id", "v"), path)
    }
    assert(VersionedTable.versions(spark, path) == before)
    assert(VersionedTable.read(spark, path).count() == 50)
    // clean append passes; stats/bloom overloads enforce too
    VersionedTable.commitAppend(batch(50, 60), path, Seq("id"))
    intercept[VersionedTable.CheckViolationException] {
      VersionedTable.commitAppend(
        Seq((-5L, "bad")).toDF("id", "v"), path, Seq("id"), bloomCols = Seq("id"))
    }
    assert(VersionedTable.read(spark, path).count() == 60)
  }

  test("NULL satisfies a CHECK (SQL semantics); merge and replaceWhere gate their writes") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 20), path, "id")
    VersionedTable.addCheck(spark, path, "v_prefixed", "v LIKE 'row%' OR v IS NULL")
    // NULL rows pass
    VersionedTable.commitAppend(
      Seq((100L, null.asInstanceOf[String])).toDF("id", "v"), path)
    assert(VersionedTable.read(spark, path).count() == 21)
    // merge with a violating upsert refuses BEFORE touching the table
    intercept[VersionedTable.CheckViolationException] {
      VersionedTable.merge(spark, path, Seq((5L, "BAD_5")).toDF("id", "v"), Seq("id"))
    }
    assert(VersionedTable.read(spark, path).filter(col("id") === 5L)
      .select("v").as[String].head() == "row_5")
    // merge deletes are NOT gated (they write nothing)
    VersionedTable.merge(spark, path,
      Seq((6L, "row_6", true)).toDF("id", "v", "_del"), Seq("id"), deleteFlag = Some("_del"))
    assert(VersionedTable.read(spark, path).filter(col("id") === 6L).count() == 0)
    // replaceWhere replacement rows are gated
    intercept[VersionedTable.CheckViolationException] {
      VersionedTable.replaceWhere(spark, path, col("id") < 3,
        Seq((0L, "NOPE")).toDF("id", "v"))
    }
    VersionedTable.replaceWhere(spark, path, col("id") < 3,
      Seq((0L, "row_0b"), (1L, "row_1b")).toDF("id", "v"))
    assert(VersionedTable.read(spark, path).filter(col("id") < 3).count() == 2)
  }

  test("checks survive compaction and overwrite; stream batches enforce; drop re-opens the gate") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    VersionedTable.addCheck(spark, path, "nonneg_id", "id >= 0")
    // carried through maintenance
    VersionedTable.compact(spark, path, targetRowsPerFile = 1000)
    assert(VersionedTable.checks(spark, path).map(_._1) == Seq("nonneg_id"))
    // overwrite keeps TABLE-level checks and validates its own rows
    intercept[VersionedTable.CheckViolationException] {
      VersionedTable.commitOverwrite(Seq((-1L, "bad")).toDF("id", "v"), path)
    }
    VersionedTable.commitOverwrite(batch(0, 5), path)
    assert(VersionedTable.checks(spark, path).map(_._1) == Seq("nonneg_id"))
    // exactly-once stream commits enforce too
    intercept[VersionedTable.CheckViolationException] {
      VersionedTable.commitStreamBatch(
        Seq((-2L, "bad")).toDF("id", "v"), path, "w1", 1L)
    }
    assert(VersionedTable.commitStreamBatch(batch(5, 8), path, "w1", 1L).isDefined)
    // drop: the gate opens, the CDF still crosses the constraint commits
    VersionedTable.dropCheck(spark, path, "nonneg_id")
    VersionedTable.commitAppend(Seq((-7L, "now ok")).toDF("id", "v"), path)
    assert(VersionedTable.read(spark, path).filter(col("id") === -7L).count() == 1)
    assert(VersionedTable.checks(spark, path).isEmpty)
  }
}
