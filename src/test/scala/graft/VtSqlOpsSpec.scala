package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Maintenance SQL for versioned tables ([[graft.sources.VtSqlParser]]):
  * DESCRIBE HISTORY / SHOW TAGS / VACUUM ... RETAIN [DRY RUN] /
  * OPTIMIZE ... TARGET must drive the library's ops paths from plain
  * `spark.sql`, the dry-run prediction must equal the subsequent real
  * removal, standard SQL must fall through to the default parser
  * untouched, and a non-vt catalog reference must refuse. */
class VtSqlOpsSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(nVersions: Int): String = {
    val path = java.nio.file.Files.createTempDirectory("vtsqlops").toString + "/tbl"
    (0 until nVersions).foreach { v =>
      VersionedTable.commitAppend(
        (0L until 20L).map(i => (v * 100L + i, s"v$v")).toDF("id", "label"),
        path, "id")
    }
    path
  }

  private def ref(path: String): String = {
    spark.conf.set("spark.sql.catalog.vtops", classOf[graft.sources.VtCatalog].getName)
    s"vtops.`$path`"
  }

  test("DESCRIBE HISTORY returns one row per version with operations and parents") {
    val path = freshTable(3)
    val rows = spark.sql(s"DESCRIBE HISTORY ${ref(path)}")
      .orderBy("version").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
    assert(rows.forall(_.getAs[String]("operation") == "append"))
    assert(rows.map(_.getAs[Long]("parent")).toSeq == Seq(-1L, 1L, 2L))
    assert(rows.forall(_.getAs[Int]("n_files") > 0))
  }

  test("SHOW TAGS lists tags set through the library API") {
    val path = freshTable(2)
    VersionedTable.setTag(spark, path, "rc1", Some(1L))
    VersionedTable.setTag(spark, path, "release", Some(2L))
    val rows = spark.sql(s"SHOW TAGS ${ref(path)}").collect()
      .map(r => (r.getAs[String]("tag"), r.getAs[Long]("version"))).toSeq
    assert(rows == Seq(("rc1", 1L), ("release", 2L)))
  }

  test("VACUUM DRY RUN predicts; VACUUM removes exactly the prediction") {
    val path = freshTable(4)
    // overwrite so old versions hold files the retained ones don't reference
    VersionedTable.overwrite(
      (0L until 5L).map(i => (i, "ow")).toDF("id", "label"), path)
    val dry = spark.sql(s"VACUUM ${ref(path)} RETAIN 1 VERSIONS DRY RUN").collect()(0)
    assert(dry.getAs[Boolean]("dry_run"))
    assert(dry.getAs[Int]("versions_removed") == 4)
    assert(dry.getAs[Int]("files_removed") > 0)
    assert(dry.getAs[Long]("bytes_removed") > 0L)
    // nothing touched by the dry run: all versions still time-travel
    assert(VersionedTable.versions(spark, path).size == 5)
    val real = spark.sql(s"VACUUM ${ref(path)} RETAIN 1 VERSIONS").collect()(0)
    assert(!real.getAs[Boolean]("dry_run"))
    assert(real.getAs[Int]("versions_removed") == dry.getAs[Int]("versions_removed"))
    assert(real.getAs[Int]("files_removed") == dry.getAs[Int]("files_removed"))
    assert(real.getAs[Long]("bytes_removed") == dry.getAs[Long]("bytes_removed"))
    assert(VersionedTable.versions(spark, path) == Seq(5L))
    assert(VersionedTable.read(spark, path).count() == 5)
  }

  test("VACUUM reports its OWN removals when commits land after a dry run") {
    val path = freshTable(2)
    VersionedTable.overwrite(
      (0L until 5L).map(i => (i, "ow")).toDF("id", "label"), path) // v3
    val dry = spark.sql(s"VACUUM ${ref(path)} RETAIN 1 VERSIONS DRY RUN").collect()(0)
    assert(dry.getAs[Int]("versions_removed") == 2)
    // another overwrite lands between the dry run and the real vacuum:
    // the real run must report what IT deleted (3 versions now), not
    // replay the stale prediction (2).
    VersionedTable.overwrite(
      (0L until 5L).map(i => (i, "ow2")).toDF("id", "label"), path) // v4
    val real = spark.sql(s"VACUUM ${ref(path)} RETAIN 1 VERSIONS").collect()(0)
    assert(real.getAs[Int]("versions_removed") == 3)
    assert(real.getAs[Long]("bytes_removed") > dry.getAs[Long]("bytes_removed"))
    assert(VersionedTable.versions(spark, path) == Seq(4L))
    assert(VersionedTable.read(spark, path).select("label").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("ow2"))
  }

  test("VACUUM STAGING reclaims only abandoned stages past the age cutoff") {
    val path = freshTable(1)
    val abandoned = VersionedTable.stageAppend(
      (0L until 5L).map(i => (i, "s")).toDF("id", "label"), path)
    val published = VersionedTable.stageAppend(
      (5L until 8L).map(i => (i, "p")).toDF("id", "label"), path)
    VersionedTable.publishStaged(spark, path, published)
    // age 0 hours: reclaims the abandoned stage, never the published one
    val r = spark.sql(s"VACUUM STAGING ${ref(path)} OLDER THAN 0 HOURS").collect()(0)
    assert(r.getAs[Int]("stages_removed") == 1)
    assert(!new java.io.File(s"$path/data/${abandoned.id}").exists())
    assert(VersionedTable.read(spark, path).count() == 23) // 20 + 3 published
    // plain VACUUM still ignores staging dirs entirely (regression guard)
    val again = VersionedTable.stageAppend(
      (9L until 11L).map(i => (i, "x")).toDF("id", "label"), path)
    spark.sql(s"VACUUM ${ref(path)} RETAIN 1 VERSIONS").collect()
    assert(new java.io.File(s"$path/data/${again.id}").exists())
    assert(VersionedTable.readStaged(spark, path, again).count() == 2)
  }

  test("OPTIMIZE compacts the small append files into one and keeps every row") {
    val path = freshTable(5) // five 20-row appends
    val before = VersionedTable.read(spark, path).count()
    val row = spark.sql(s"OPTIMIZE ${ref(path)} TARGET 1000 ROWS").collect()(0)
    assert(row.getAs[Long]("files_rewritten") >= 5L)
    assert(row.getAs[Long]("new_version") == 6L)
    assert(VersionedTable.read(spark, path).count() == before)
    val hist = spark.sql(s"DESCRIBE HISTORY ${ref(path)}")
      .orderBy(col("version").desc).collect()
    assert(hist.head.getAs[String]("operation") == "compact")
  }

  test("OPTIMIZE ... WHERE compacts only files whose recorded range intersects") {
    val path = java.nio.file.Files.createTempDirectory("vtsqlops").toString + "/tbl"
    // four disjoint id slabs, one small file each, ranges recorded
    for (s <- 0 until 4)
      VersionedTable.commitAppend(
        (s * 100L until s * 100L + 20L).map(i => (i, s"s$s")).toDF("id", "label")
          .coalesce(1),
        path, "id")
    val before = VersionedTable.read(spark, path).count()
    val row = spark.sql(
      s"OPTIMIZE ${ref(path)} TARGET 1000 ROWS WHERE id BETWEEN 0 AND 150").collect()(0)
    // only the two slabs intersecting [0, 150] rewrite
    assert(row.getAs[Long]("files_rewritten") == 2L, row.toString)
    assert(VersionedTable.read(spark, path).count() == before)
    // out-of-scope slabs kept their ORIGINAL files (same relative names)
    val hist = spark.sql(s"DESCRIBE HISTORY ${ref(path)}")
      .orderBy(col("version").desc).collect()
    assert(hist.head.getAs[String]("operation") == "compact")
    // a scope column without recorded stats refuses
    val e = intercept[Exception](spark.sql(
      s"OPTIMIZE ${ref(path)} TARGET 1000 ROWS WHERE label BETWEEN 0 AND 1").collect())
    assert(e.getMessage.contains("recorded stats"), e.getMessage)
  }

  test("ANALYZE retrofits file-skipping ranges: pruning kicks in, rows unchanged") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
      val root = df.queryExecution.executedPlan
      root.executeCollect()
      val finals = root +: root.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      finals.flatMap(_.collect { case s: FileSourceScanExec => s })
        .map(_.metrics("numFiles").value).sum
    }
    // four single-file commits with disjoint id ranges, NO stats recorded
    val path = java.nio.file.Files.createTempDirectory("vtsqlops").toString + "/tbl"
    (0 until 4).foreach { b =>
      VersionedTable.commitAppend(
        (b * 100L until (b + 1) * 100L).map(i => (i, s"r$i")).toDF("id", "label")
          .coalesce(1), path)
    }
    def probe = VersionedTable.table(spark, path).filter(col("id").between(150, 160))
    assert(filesScanned(probe) == 4, "no stats yet: every file scanned")
    val row = spark.sql(s"ANALYZE ${ref(path)} COMPUTE STATS FOR COLUMNS id").collect()(0)
    assert(row.getAs[Long]("new_version") == 5L)
    assert(filesScanned(probe) == 1, "retrofitted ranges must prune to the one file")
    assert(probe.count() == 11)
    // metadata-only: history records 'analyze', countRows rides the new counts
    val hist = spark.sql(s"DESCRIBE HISTORY ${ref(path)}")
      .orderBy(col("version").desc).collect()
    assert(hist.head.getAs[String]("operation") == "analyze")
    assert(VersionedTable.countRows(spark, path) == 400L)
  }

  test("ANALYZE BLOOMS retrofits point-lookup pruning without a rewrite") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("vtsqlops").toString + "/tbl"
    (0 until 4).foreach { b =>
      VersionedTable.commitAppend(
        (b * 100L until (b + 1) * 100L).map(i => (i, s"r$i")).toDF("id", "label")
          .coalesce(1), path)
    }
    assert(VersionedTable.filesForKeys(spark, path, "id", Array(150L)).isEmpty,
      "no blooms yet: filesForKeys must report uncovered")
    val row = spark.sql(s"ANALYZE ${ref(path)} COMPUTE BLOOMS FOR COLUMNS id").collect()(0)
    assert(row.getAs[Long]("new_version") == 5L)
    val pruned = VersionedTable.filesForKeys(spark, path, "id", Array(150L))
    assert(pruned.isDefined && pruned.get.size == 1,
      s"bloom should admit exactly the one file holding 150, got $pruned")
    // rows unchanged, commit is metadata+sidecar only
    assert(VersionedTable.read(spark, path).count() == 400)
    val hist = spark.sql(s"DESCRIBE HISTORY ${ref(path)}")
      .orderBy(col("version").desc).collect()
    assert(hist.head.getAs[String]("operation") == "analyze")
  }

  test("RESTORE rolls back as a new commit; DESCRIBE DETAIL reflects it") {
    val path = freshTable(3) // versions 1..3, 20 rows each
    val row = spark.sql(s"RESTORE ${ref(path)} TO VERSION 1").collect()(0)
    assert(row.getAs[Long]("restored_version") == 1L)
    assert(row.getAs[Long]("new_version") == 4L)
    assert(VersionedTable.read(spark, path).count() == 20)
    // history kept: the pre-restore snapshot still time-travels
    assert(VersionedTable.read(spark, path, Some(3L)).count() == 60)
    val detail = spark.sql(s"DESCRIBE DETAIL ${ref(path)}").collect()(0)
    assert(detail.getAs[String]("location") == path)
    assert(detail.getAs[Long]("current_version") == 4L)
    assert(detail.getAs[Int]("n_versions") == 4)
    assert(detail.getAs[Long]("n_rows") == 20L)
    assert(detail.getAs[Int]("n_columns") == 2)
    assert(detail.getAs[Int]("n_tags") == 0)
    assert(detail.getAs[Int]("n_staged") == 0)
    // a pending WAP stage is visible; publishing clears the signal
    val staged = VersionedTable.stageAppend(
      (0L until 3L).map(i => (i, "w")).toDF("id", "label"), path)
    assert(spark.sql(s"DESCRIBE DETAIL ${ref(path)}").collect()(0)
      .getAs[Int]("n_staged") == 1)
    VersionedTable.publishStaged(spark, path, staged)
    assert(spark.sql(s"DESCRIBE DETAIL ${ref(path)}").collect()(0)
      .getAs[Int]("n_staged") == 0)
  }

  test("DESCRIBE DETAIL reports per-column planner pruning (both channels + blooms)") {
    val path = java.nio.file.Files.createTempDirectory("vtsqlops").toString + "/tbl"
    VersionedTable.commitAppend(
      (0L until 20L).map(i => (i, f"D$i%04d", i / 20.0)).toDF("id", "doc_key", "score"),
      path, Seq("id", "doc_key", "score"), bloomCols = Seq("id", "doc_key"))
    val detail = spark.sql(s"DESCRIBE DETAIL ${ref(path)}").collect()(0)
    // stats_columns names both channels...
    assert(detail.getAs[String]("stats_columns") ==
      "id:long, score:long, doc_key:string, score:double")
    // ...and planner_pruning states what an ORDINARY filter prunes: the
    // typed domain wins where both channels record, blooms add points
    assert(detail.getAs[String]("planner_pruning") ==
      "doc_key:ranges(string)+bloom, id:ranges(long)+bloom, score:ranges(double)")
    // a stats-less, bloom-less table reports none
    val bare = java.nio.file.Files.createTempDirectory("vtsqlops").toString + "/tbl"
    VersionedTable.commitAppend((0L until 5L).map(i => (i, s"x$i")).toDF("id", "v"), bare)
    assert(spark.sql(s"DESCRIBE DETAIL ${ref(bare)}").collect()(0)
      .getAs[String]("planner_pruning") == "none")
  }

  test("vt_changes table function serves the row-level change feed from SQL") {
    val path = freshTable(3)
    val rows = spark.sql(s"SELECT * FROM vt_changes('$path', 1, 3)").collect()
    assert(rows.length == 40) // versions 2 and 3 appended 20 rows each
    assert(rows.forall(_.getAs[String]("_change_type") == "insert"))
    val byVersion = rows.groupBy(_.getAs[Long]("_commit_version")).view.mapValues(_.length).toMap
    assert(byVersion == Map(2L -> 20, 3L -> 20))
    // literals enforced
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM vt_changes('$path', 1, (SELECT 3))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("standard SQL falls through to the default parser untouched") {
    assert(spark.sql("SELECT 1 + 1 AS two").collect()(0).getAs[Int]("two") == 2)
    // a statement mentioning the keywords inside normal SQL still parses
    assert(spark.sql("SELECT 'VACUUM t RETAIN 1 VERSIONS' AS s").count() == 1)
  }

  test("maintenance statements refuse non-vt catalog references") {
    val e = intercept[Exception] {
      spark.sql("DESCRIBE HISTORY spark_catalog.default.nope").collect()
    }
    assert(e.getMessage.contains("not a graft versioned-table catalog"))
  }
}
