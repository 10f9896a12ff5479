package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** `VersionedTable.table` — the predicate-pruning FileIndex read path:
  * ordinary Catalyst filters (DataFrame or SQL) must cut the scanned file
  * set via manifest ranges and bloom sidecars, visible in the executed
  * plan's numFiles metric, while never changing results. */
class VersionedTableIndexSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("vt_idx").toString + "/tbl"

  /** Total parquet files the executed plan's file scans actually listed
    * (post-pruning), AQE-aware. */
  private def filesScanned(df: DataFrame): Long = {
    val root = df.queryExecution.executedPlan
    root.executeCollect() // run THIS plan so its own metrics populate
    val finals = root +: root.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    finals.flatMap(_.collect { case s: FileSourceScanExec => s })
      .map(_.metrics("numFiles").value).sum
  }

  /** Four single-file commits with disjoint id ranges + id blooms. */
  private def rangedTable(): String = {
    val path = freshDir()
    (0 until 4).foreach { b =>
      val batch = (b * 100 until (b + 1) * 100)
        .map(i => (i.toLong, s"row_$i")).toDF("id", "v").coalesce(1)
      VersionedTable.commitAppend(batch, path, Seq("id"), bloomCols = Seq("id"))
    }
    path
  }

  test("table() matches read() with no predicates; all files scanned") {
    val path = rangedTable()
    val t = VersionedTable.table(spark, path)
    assert(t.orderBy("id").collect().toSeq ==
      VersionedTable.read(spark, path).orderBy("id").collect().toSeq)
    assert(filesScanned(VersionedTable.table(spark, path)) == 4)
  }

  test("range predicates prune files at planning time: between, =, >=, SQL view") {
    val path = rangedTable()
    def t = VersionedTable.table(spark, path)
    // between inside one commit's range -> 1 of 4 files
    val between = t.filter(col("id").between(250, 260))
    assert(between.count() == 11)
    assert(filesScanned(t.filter(col("id").between(250, 260))) == 1)
    // equality -> range cut to 1 file (and the bloom agrees)
    assert(filesScanned(t.filter(col("id") === 42L)) == 1)
    // >= spanning two commits -> 2 files
    assert(filesScanned(t.filter(col("id") >= 200L)) == 2)
    // conjunction tightens: contradictory bounds -> zero files
    assert(filesScanned(t.filter(col("id") > 250L && col("id") < 220L)) == 0)
    // the same predicate through SQL prunes identically
    t.createOrReplaceTempView("vt_idx_sql")
    val viaSql = spark.sql("SELECT count(*) AS n FROM vt_idx_sql WHERE id BETWEEN 250 AND 260")
    assert(viaSql.as[Long].head() == 11)
    assert(filesScanned(
      spark.sql("SELECT * FROM vt_idx_sql WHERE id BETWEEN 250 AND 260")) == 1)
  }

  test("bloom sidecars prune point probes ranges cannot (scattered keys)") {
    val path = freshDir()
    val evens = (0 until 400 by 2).map(i => (i.toLong, s"row_$i")).toDF("id", "v").coalesce(1)
    val odds = (1 until 400 by 2).map(i => (i.toLong, s"row_$i")).toDF("id", "v").coalesce(1)
    VersionedTable.commitAppend(evens, path, Seq("id"), bloomCols = Seq("id"))
    VersionedTable.commitAppend(odds, path, Seq("id"), bloomCols = Seq("id"))
    def t = VersionedTable.table(spark, path)
    // both files span [0,399]: ranges keep 2, the bloom cuts to the evens file
    assert(filesScanned(t.filter(col("id") === 42L)) == 1)
    // absent key: bloom prunes everything, zero files opened
    assert(filesScanned(t.filter(col("id") === 999983L)) == 0)
    // IN-list with an even and an odd key needs both files
    assert(filesScanned(t.filter(col("id").isin(42L, 43L))) == 2)
    assert(t.filter(col("id").isin(42L, 43L)).count() == 2)
  }

  test("deletion vectors still apply; predicates prune through the anti-join") {
    val path = rangedTable()
    VersionedTable.deleteWhereDV(spark, path, col("id") % 10 === 0)
    val t = VersionedTable.table(spark, path)
    assert(t.count() == 360)
    // [250,260] holds 11 ids; 250 and 260 are DV-deleted
    assert(t.filter(col("id").between(250, 260)).count() == 9)
    assert(t.filter(col("id").between(250, 260)).orderBy("id").select("id").as[Long]
      .collect().toSeq == (251 to 259).filterNot(_ % 10 == 0).map(_.toLong))
  }

  test("time travel: table(version) sees the old snapshot and prunes within it") {
    val path = freshDir()
    val v1 = VersionedTable.commitAppend(
      (0 until 100).map(i => (i.toLong, s"a_$i")).toDF("id", "v").coalesce(1),
      path, Seq("id"), bloomCols = Seq("id"))
    VersionedTable.commitAppend(
      (100 until 200).map(i => (i.toLong, s"b_$i")).toDF("id", "v").coalesce(1),
      path, Seq("id"), bloomCols = Seq("id"))
    assert(VersionedTable.table(spark, path, Some(v1)).count() == 100)
    assert(filesScanned(
      VersionedTable.table(spark, path).filter(col("id") < 100L)) == 1)
  }
}
