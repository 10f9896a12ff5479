package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Write-audit-publish ([[VersionedTable.stageAppend]] family): staged
  * files are invisible to every reader until publish adopts them
  * metadata-only; audits gate the publish; vacuum never reaps a stage
  * mid-audit; abandoned stages reclaim explicitly. */
class WapSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("wap").toString + "/tbl"

  private def batch(a: Int, b: Int) =
    (a until b).map(i => (i.toLong, s"row_$i")).toDF("id", "v")

  test("staged batch is invisible; publish adopts it metadata-only; abort deletes") {
    val path = fresh()
    VersionedTable.commitAppend(batch(0, 10), path) // v1
    val staged = VersionedTable.stageAppend(batch(10, 15), path)
    // invisible everywhere: current read, version chain
    assert(VersionedTable.read(spark, path).count() == 10)
    assert(VersionedTable.versions(spark, path) == Seq(1L))
    // the audit surface sees exactly the staged rows
    assert(VersionedTable.readStaged(spark, path, staged).count() == 5)

    val v = VersionedTable.publishStaged(spark, path, staged)
    assert(v == 2L && VersionedTable.read(spark, path).count() == 15)
    // metadata-only adoption: the manifest references the staging dir
    assert(VersionedTable.read(spark, path).filter(col("id") >= 10).count() == 5)
    // double publish refused; abort-after-publish refused
    intercept[IllegalArgumentException](VersionedTable.publishStaged(spark, path, staged))
    intercept[IllegalArgumentException](VersionedTable.abortStaged(spark, path, staged))
    assert(VersionedTable.read(spark, path).count() == 15, "failed abort touched nothing")

    // a rejected stage aborts cleanly
    val bad = VersionedTable.stageAppend(batch(100, 105), path)
    VersionedTable.abortStaged(spark, path, bad)
    assert(!new java.io.File(s"$path/data/${bad.id}").exists())
    assert(VersionedTable.read(spark, path).count() == 15)
    intercept[IllegalArgumentException](VersionedTable.publishStaged(spark, path, bad))
  }

  test("a CHECK constraint added between stage and publish still gates") {
    val path = fresh()
    VersionedTable.commitAppend(batch(0, 5), path)
    val staged = VersionedTable.stageAppend(
      Seq((-1L, "neg")).toDF("id", "v"), path) // fine at stage time
    VersionedTable.addCheck(spark, path, "id_nonneg", "id >= 0")
    val e = intercept[Exception](VersionedTable.publishStaged(spark, path, staged))
    assert(e.getMessage.contains("id_nonneg"))
    assert(VersionedTable.read(spark, path).count() == 5, "refused publish committed nothing")
  }

  test("vacuum skips an unpublished stage; vacuumStaging reclaims abandoned ones") {
    val path = fresh()
    VersionedTable.commitAppend(batch(0, 5), path)
    VersionedTable.commitOverwrite(batch(0, 3), path) // makes v1 files reclaimable
    val staged = VersionedTable.stageAppend(batch(50, 60), path)
    val (_, files, _) = VersionedTable.vacuumWithStats(spark, path, keepLast = 1)
    assert(files.nonEmpty, "the overwritten v1 files must be reclaimed")
    assert(!files.exists(_.startsWith(staged.id)), "mid-audit stage must survive vacuum")
    assert(VersionedTable.readStaged(spark, path, staged).count() == 10)
    // explicit reclamation with a future cutoff reaps the abandoned stage
    assert(VersionedTable.vacuumStaging(
      spark, path, System.currentTimeMillis() + 60000) == 1)
    assert(!new java.io.File(s"$path/data/${staged.id}").exists())
    // a PUBLISHED stage is never touched, even with a future cutoff
    val keep = VersionedTable.stageAppend(batch(60, 62), path)
    VersionedTable.publishStaged(spark, path, keep)
    assert(VersionedTable.vacuumStaging(
      spark, path, System.currentTimeMillis() + 60000) == 0)
    assert(VersionedTable.read(spark, path).filter(col("id") >= 60).count() == 2)
  }

  test("published stage whose references age out is reclaimed by vacuum, not counted pending") {
    val path = fresh()
    VersionedTable.commitAppend(batch(0, 5), path) // v1
    val staged = VersionedTable.stageAppend(batch(10, 20), path)
    VersionedTable.publishStaged(spark, path, staged) // v2 adopts
    assert(VersionedTable.stagedPending(spark, path) == 0, "published is not pending")
    VersionedTable.commitOverwrite(batch(0, 3), path) // v3 drops the reference at HEAD
    // retention trims every manifest that referenced the stage: without
    // the published marker this dir would leak forever (vacuum would skip
    // it as mid-audit) and miscount as a stuck audit
    val (_, files, _) = VersionedTable.vacuumWithStats(spark, path, keepLast = 1)
    assert(files.exists(_.startsWith(staged.id)),
      "published-then-expired stage files must be reclaimable by vacuum")
    assert(!new java.io.File(s"$path/data/${staged.id}").exists(),
      "stage dir reclaimed once only the marker remains")
    assert(VersionedTable.stagedPending(spark, path) == 0)
    assert(VersionedTable.read(spark, path).count() == 3)
  }

  test("re-publishing a published-expired stage refuses (marker outlives the manifests)") {
    // ADVICE r13: once every manifest referencing an adopted stage ages
    // out, the retained-manifest double-publish check can no longer see
    // the adoption — only the marker can. Re-adopting would duplicate
    // every row the stage carried the first time.
    val path = fresh()
    VersionedTable.commitAppend(batch(0, 5), path) // v1
    val staged = VersionedTable.stageAppend(batch(10, 20), path)
    VersionedTable.publishStaged(spark, path, staged) // v2 adopts
    VersionedTable.commitOverwrite(batch(0, 3), path) // v3 drops the reference at HEAD
    // simulate retention trimming v1/v2 WITHOUT reclaiming the stage dir
    // (the window SHOW STAGES reports as 'published-expired')
    (1L to 2L).foreach { v =>
      val f = new java.io.File(path + f"/_versions/v$v%010d.json")
      assert(f.delete(), s"trim $f")
      new java.io.File(path + f"/_versions/.v$v%010d.json.crc").delete()
    }
    assert(new java.io.File(s"$path/data/${staged.id}/_published").exists())
    val e = intercept[IllegalArgumentException](
      VersionedTable.publishStaged(spark, path, staged))
    assert(e.getMessage.contains("already published"), e.getMessage)
    // the batch flavor refuses identically (its txn record aged out with
    // the manifests, so the marker is its only witness too)
    val e2 = intercept[IllegalArgumentException](
      VersionedTable.publishStagedBatch(spark, path, staged, "w1", 1L))
    assert(e2.getMessage.contains("already published"), e2.getMessage)
    // table content untouched by the refusals
    assert(VersionedTable.read(spark, path).count() == 3)
  }

  test("vacuum heals the published marker on a stage published before the marker existed") {
    val path = fresh()
    VersionedTable.commitAppend(batch(0, 5), path)
    val staged = VersionedTable.stageAppend(batch(10, 20), path)
    VersionedTable.publishStaged(spark, path, staged)
    val marker = new java.io.File(s"$path/data/${staged.id}/_published")
    assert(marker.exists(), "publish records adoption")
    assert(marker.delete()) // simulate a pre-marker publish
    // while references hold, it is still not pending and not reapable —
    // and vacuum re-marks it from the manifest evidence
    assert(VersionedTable.stagedPending(spark, path) == 0)
    VersionedTable.vacuumWithStats(spark, path, keepLast = 10)
    assert(marker.exists(), "vacuum heals the marker from manifest evidence")
    assert(VersionedTable.readStaged(spark, path, staged).count() == 10,
      "marker is invisible to parquet reads of the staged dir")
    // vacuumStaging never touches it, even with a future cutoff
    assert(VersionedTable.vacuumStaging(
      spark, path, System.currentTimeMillis() + 60000) == 0)
  }

  test("stage SQL surface: SHOW STAGES, PUBLISH STAGE by id, ABORT STAGE refusals") {
    val path = fresh()
    VersionedTable.commitAppend(batch(0, 10), path) // v1
    // a writer stages twice and "crashes" — only the ids remain knowable
    val good = VersionedTable.stageAppend(batch(10, 15), path)
    val bad = VersionedTable.stageAppend(batch(100, 103), path)

    def show() = spark.sql(s"SHOW STAGES IN `$path`").collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(show() == Map(good.id -> "pending", bad.id -> "pending"))

    // crash recovery: publish from the id alone (no handle object)
    val pub = spark.sql(s"PUBLISH STAGE '${good.id}' IN `$path`").collect()(0)
    assert(pub.getLong(1) == 2L && pub.getLong(2) == 5L)
    assert(VersionedTable.read(spark, path).count() == 15)
    assert(show() == Map(good.id -> "published", bad.id -> "pending"))

    // double publish refused; abort of a published stage refused
    intercept[Exception](spark.sql(s"PUBLISH STAGE '${good.id}' IN `$path`").collect())
    val e = intercept[Exception](
      spark.sql(s"ABORT STAGE '${good.id}' IN `$path`").collect())
    assert(e.getMessage.contains("published"))
    assert(VersionedTable.read(spark, path).count() == 15)

    // abort the failed audit's stage by id
    assert(spark.sql(s"ABORT STAGE '${bad.id}' IN `$path`").collect()(0).getBoolean(1))
    assert(show() == Map(good.id -> "published"))
    intercept[Exception](spark.sql(s"PUBLISH STAGE '${bad.id}' IN `$path`").collect())

    // a published stage whose references age out reads published-expired
    VersionedTable.commitOverwrite(batch(0, 3), path)
    VersionedTable.vacuumWithStats(spark, path, keepLast = 1)
    assert(!show().contains(good.id), "vacuum reclaimed the expired stage")
  }

  test("publish with statsCols records file-skipping ranges for the adopted files") {
    val path = fresh()
    VersionedTable.commitAppend(batch(0, 10).repartition(1), path, "id")
    val staged = VersionedTable.stageAppend(
      batch(1000, 1100).repartition(2), path)
    VersionedTable.publishStaged(spark, path, staged, statsCols = Seq("id"))
    // a pruned read on the far range opens only the staged files
    val pruned = VersionedTable.readWhere(spark, path, "id", 1000L, 1099L)
    assert(pruned.count() == 100)
    assert(pruned.select(input_file_name()).distinct().collect()
      .forall(_.getString(0).contains(staged.id)), "pre-existing file must prune away")
  }
}
