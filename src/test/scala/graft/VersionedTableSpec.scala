package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

class VersionedTableSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("vt_spec").toString + "/tbl"

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"row_$i")).toDF("id", "v")

  test("append versions accumulate; every old version time-travels bit-identically") {
    val path = freshDir()
    val v1 = VersionedTable.commitAppend(batch(0, 10), path)
    val v2 = VersionedTable.commitAppend(batch(10, 15), path)
    assert((v1, v2) == (1L, 2L))
    assert(VersionedTable.versions(spark, path) == Seq(1L, 2L))
    assert(VersionedTable.read(spark, path).count() == 15)
    assert(
      VersionedTable.read(spark, path, Some(1L)).select("id").as[Long].collect().sorted
        .sameElements(0L until 10L))
    assert(
      VersionedTable.read(spark, path, Some(2L)).select("id").as[Long].collect().sorted
        .sameElements(0L until 15L))
  }

  test("overwrite replaces going forward; the pre-overwrite snapshot survives") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    val v2 = VersionedTable.commitOverwrite(batch(100, 103), path)
    assert(v2 == 2L)
    assert(
      VersionedTable.read(spark, path).select("id").as[Long].collect().sorted
        .sameElements(100L until 103L))
    assert(VersionedTable.read(spark, path, Some(1L)).count() == 10)
  }

  test("uncommitted staged files are invisible to readers") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    // A crashed/in-flight writer: data files exist, no manifest references
    // them. A directory-listing reader would see 20 rows; a manifest
    // reader must still see 10.
    batch(500, 510).write.parquet(s"$path/data/in-flight-commit")
    assert(VersionedTable.read(spark, path).count() == 10)
  }

  test("a lost commit race retries onto the next version and re-bases the append") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    // Simulate an interloper that won version 2 with the same files as v1:
    // copy v1's manifest body into the v2 slot before our append lands.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val v1 = new org.apache.hadoop.fs.Path(s"$path/_versions/v0000000001.json")
    val v2 = new org.apache.hadoop.fs.Path(s"$path/_versions/v0000000002.json")
    org.apache.hadoop.fs.FileUtil.copy(fs, v1, fs, v2, false, spark.sparkContext.hadoopConfiguration)
    val committed = VersionedTable.commitAppend(batch(10, 15), path)
    assert(committed == 3L, "append must land AFTER the interloper's version")
    assert(VersionedTable.read(spark, path).count() == 15)
  }

  test("vacuum drops old versions and their unreferenced files; latest keeps reading") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    VersionedTable.commitOverwrite(batch(100, 105), path)
    VersionedTable.commitAppend(batch(105, 108), path)
    val (manifestsGone, filesGone) = VersionedTable.vacuum(spark, path, keepLast = 2)
    assert(manifestsGone == 1)
    assert(filesGone > 0, "v1's files are unreferenced by v2/v3 and must be deleted")
    assert(VersionedTable.versions(spark, path) == Seq(2L, 3L))
    assert(VersionedTable.read(spark, path).count() == 8)
    assert(VersionedTable.read(spark, path, Some(2L)).count() == 5)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, Some(1L))
    }
  }

  test("append after vacuum still carries forward the retained file set") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    VersionedTable.commitAppend(batch(10, 12), path)
    VersionedTable.vacuum(spark, path, keepLast = 1)
    VersionedTable.commitAppend(batch(12, 14), path)
    assert(VersionedTable.read(spark, path).count() == 14)
  }

  test("deleteWhere rewrites only the files that hold doomed rows; others carry by reference") {
    val path = freshDir()
    // three appends = three disjoint commit dirs / key ranges
    VersionedTable.commitAppend(batch(0, 100), path)
    VersionedTable.commitAppend(batch(100, 200), path)
    VersionedTable.commitAppend(batch(200, 300), path)
    val fsRoot = java.nio.file.Paths.get(path, "data")
    def dataFiles(): Map[String, Long] = { // rel name -> mtime
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(fsRoot).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p))
        .map(p => fsRoot.relativize(p).toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = dataFiles()
    // doomed keys live ONLY in the second append's range
    val (v, deleted) = VersionedTable.deleteWhere(spark, path, col("id").between(110, 119))
    assert(v == 4L && deleted == 10L)
    val ids = VersionedTable.read(spark, path).select("id").as[Long].collect().sorted
    assert(ids.length == 290 && !ids.exists(i => i >= 110 && i <= 119))
    // untouched commits' files are byte-identical (same path, same mtime)
    val after = dataFiles()
    val untouched = before.keySet.filter(f => after.contains(f))
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(before(f) == after(f), s"file $f was rewritten"))
    // the pre-delete snapshot still time-travels WITH the deleted rows
    assert(VersionedTable.read(spark, path, Some(3L)).count() == 300)
    // physical purge: vacuum to the delete version drops the old file
    VersionedTable.vacuum(spark, path, keepLast = 1)
    assert(VersionedTable.read(spark, path).count() == 290)
    assert(VersionedTable.versions(spark, path) == Seq(4L))
  }

  test("manifest file-range stats prune a key-range read to the files that can match") {
    val path = freshDir()
    // three stats-carrying appends with disjoint key ranges, range-
    // clustered inside each commit so per-file ranges are tight
    def clustered(lo: Int, hi: Int) =
      batch(lo, hi).repartitionByRange(3, col("id"))
    VersionedTable.commitAppend(clustered(0, 100), path, statsCol = "id")
    VersionedTable.commitAppend(clustered(100, 200), path, statsCol = "id")
    VersionedTable.commitAppend(clustered(200, 300), path, statsCol = "id")
    val all = VersionedTable.read(spark, path)
    val total = all.inputFiles.length
    // the pruned file set must cover the range and skip the other commits
    val kept = VersionedTable.filesForRange(spark, path, 110, 119)
    assert(kept.nonEmpty && kept.size < total, s"kept ${kept.size} of $total files")
    val got = VersionedTable.readWhere(spark, path, "id", 110, 119)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (110L to 119L))
    // an empty range reads nothing but keeps the schema
    val none = VersionedTable.readWhere(spark, path, "id", 5000, 6000)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "v"))
    // a stats-less append is NEVER pruned (safety over sharpness)
    VersionedTable.commitAppend(batch(1000, 1010), path) // no statsCol
    val keptAfter = VersionedTable.filesForRange(spark, path, 110, 119)
    val got2 = VersionedTable.readWhere(spark, path, "id", 110, 119)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got2 == (110L to 119L))
    // the unranged files are in every pruned set
    assert(keptAfter.size > kept.size)
  }

  test("multi-column manifest stats prune on EITHER column; conjunction prunes hardest") {
    val path = freshDir()
    // 64x64 grid z-ordered into 16 files: each file ~a 16x16 tile, so
    // per-file [min,max] is tight on BOTH x and y at once
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"), col("id").as("p"))
    val clustered = grid
      .withColumn("__z", graft.functions.InterleaveBitsN(Seq(col("x"), col("y"))))
      .repartitionByRange(16, col("__z")).sortWithinPartitions("__z").drop("__z")
    VersionedTable.commitAppend(clustered, path, Seq("x", "y"))
    val total = VersionedTable.read(spark, path).inputFiles.length
    assert(total >= 12, s"expected ~16 files, got $total")
    val xs = VersionedTable.filesForRanges(spark, path, Map("x" -> (0L, 7L)))
    val ys = VersionedTable.filesForRanges(spark, path, Map("y" -> (0L, 7L)))
    val both = VersionedTable.filesForRanges(spark, path, Map("x" -> (0L, 7L), "y" -> (0L, 7L)))
    assert(xs.size < total, s"x-slab kept ${xs.size} of $total")
    assert(ys.size < total, s"y-slab kept ${ys.size} of $total")
    assert(both.size <= math.min(xs.size, ys.size) && both.size <= 4,
      s"conjunction kept ${both.size} (x=${xs.size}, y=${ys.size})")
    // exact results through the pruned read
    val got = VersionedTable.readWhereAll(spark, path, Map("x" -> (0L, 7L), "y" -> (0L, 7L)))
      .select("p").as[Long].collect().sorted.toSeq
    val want = grid.filter(col("x") <= 7 && col("y") <= 7)
      .select("p").as[Long].collect().sorted.toSeq
    assert(got == want && got.size == 64) // the 8x8 corner
    // the single-column legacy API refuses ambiguity on a 2-column table
    val err = intercept[IllegalArgumentException] {
      VersionedTable.filesForRange(spark, path, 0, 7)
    }
    assert(err.getMessage.contains("name one"))
    // compaction on a multi-column table keeps both columns' pruning sharp
    VersionedTable.commitAppend(clustered.limit(50), path, Seq("x", "y")) // small-file sprawl
    VersionedTable.compact(spark, path, targetRowsPerFile = 300)
    val afterTotal = VersionedTable.read(spark, path).inputFiles.length
    val afterX = VersionedTable.filesForRanges(spark, path, Map("x" -> (0L, 7L)))
    assert(afterX.size < afterTotal, s"post-compact x-slab kept ${afterX.size} of $afterTotal")
    assert(VersionedTable.readWhereAll(spark, path, Map("x" -> (0L, 7L), "y" -> (0L, 7L)))
      .count() >= 64)
  }

  test("changes() returns exactly the appended increment and refuses non-append windows") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    VersionedTable.commitAppend(batch(10, 25), path)
    VersionedTable.commitAppend(batch(25, 30), path)
    // window (1, 3]: the second and third appends
    val delta = VersionedTable.changes(spark, path, 1L, 3L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(delta == (10L until 30L))
    // empty window
    assert(VersionedTable.changes(spark, path, 3L, 3L).count() == 0)
    // an overwrite inside the window is refused
    VersionedTable.commitOverwrite(batch(0, 5), path)
    val err = intercept[IllegalArgumentException] {
      VersionedTable.changes(spark, path, 1L, 4L).collect()
    }
    assert(err.getMessage.contains("append-only"))
  }

  test("compact merges small files, keeps every row, and keeps range pruning sharp") {
    val path = freshDir()
    // many tiny stats-carrying appends -> file sprawl
    (0 until 10).foreach(i =>
      VersionedTable.commitAppend(
        batch(i * 20, (i + 1) * 20).repartition(2), path, statsCol = "id"))
    val before = VersionedTable.read(spark, path)
    val filesBefore = before.inputFiles.length
    assert(filesBefore >= 20)
    val (v, rewritten) = VersionedTable.compact(spark, path, targetRowsPerFile = 100)
    assert(v == 11L && rewritten == filesBefore)
    val after = VersionedTable.read(spark, path)
    assert(after.inputFiles.length < filesBefore / 2,
      s"${after.inputFiles.length} files after compacting $filesBefore")
    assert(after.select("id").as[Long].collect().sorted.toSeq == (0L until 200L))
    // stats were recomputed for the packed files: pruning still works
    val kept = VersionedTable.filesForRange(spark, path, 0, 49)
    assert(kept.size < after.inputFiles.length)
    assert(VersionedTable.readWhere(spark, path, "id", 0, 49)
      .select("id").as[Long].collect().sorted.toSeq == (0L to 49L))
    // pre-compaction snapshot still time-travels
    assert(VersionedTable.read(spark, path, Some(10L)).count() == 200)
    // compacting a compacted table is a no-op
    val (v2, r2) = VersionedTable.compact(spark, path, targetRowsPerFile = 100)
    assert(v2 == 11L && r2 == 0L)
  }

  test("history reports every version's operation, lineage, file count, and writers") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    VersionedTable.commitStreamBatch(batch(10, 12), path, "ingest", 0L)
    VersionedTable.commitOverwrite(batch(0, 3), path)
    val h = VersionedTable.history(spark, path)
    assert(h.map(v => (v.version, v.operation, v.parent)) ==
      Seq((1L, "append", -1L), (2L, "stream-append", 1L), (3L, "overwrite", 2L)))
    assert(h(1).writers == Seq("ingest") && h(2).writers == Seq("ingest"))
    assert(h(0).nFiles > 0 && h(1).nFiles > h(0).nFiles)
  }

  test("column rename is metadata-only; appends under the new name read back merged") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 5), path) // v1: (id, v)
    val filesBefore = VersionedTable.read(spark, path).inputFiles.sorted.toSeq
    val rv = VersionedTable.renameColumn(spark, path, "v", "label") // v2: zero files touched
    assert(rv == 2L)
    assert(VersionedTable.read(spark, path).inputFiles.sorted.toSeq == filesBefore,
      "rename must not rewrite data files")
    // append under the NEW name; read back reconciles old + new files
    VersionedTable.commitAppend(
      (5 until 8).map(i => (i.toLong, s"row_$i")).toDF("id", "label"), path) // v3
    val merged = VersionedTable.read(spark, path)
    assert(merged.columns.toSeq == Seq("id", "label"))
    assert(merged.select("label").as[String].collect().sorted.toSeq ==
      (0 until 8).map(i => s"row_$i").sorted)
    // time travel: the pre-rename version still reads under its own name
    assert(VersionedTable.read(spark, path, Some(1L)).columns.toSeq == Seq("id", "v"))
    // chained rename composes
    VersionedTable.renameColumn(spark, path, "label", "tag") // v4
    val chained = VersionedTable.read(spark, path)
    assert(chained.columns.toSeq == Seq("id", "tag"))
    assert(chained.filter(col("tag").isNull).count() == 0)
    // renaming onto a retired name is refused (would be ambiguous)
    val err = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, path, "tag", "v")
    }
    assert(err.getMessage.contains("retired"))
    // compaction migrates old-named files to the current physical schema
    val (_, rewritten) = VersionedTable.compact(spark, path, targetRowsPerFile = 1000000)
    assert(rewritten > 0)
    val compacted = VersionedTable.read(spark, path)
    assert(compacted.columns.toSeq == Seq("id", "tag") && compacted.count() == 8)
    val physical = spark.read.parquet(compacted.inputFiles: _*)
    assert(physical.columns.toSeq == Seq("id", "tag"), "compacted files carry the new name")
  }

  test("type widening is metadata-only; old int files upcast to long at scan time") {
    val path = freshDir()
    val ints = (0 until 5).map(i => (i, s"row_$i")).toDF("id", "v") // id: INT
    VersionedTable.commitAppend(ints, path) // v1
    VersionedTable.widenColumn(spark, path, "id", org.apache.spark.sql.types.LongType) // v2
    // append with LONG ids beyond int range
    VersionedTable.commitAppend(
      Seq((5000000000L, "big")).toDF("id", "v"), path) // v3
    val df = VersionedTable.read(spark, path)
    assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(df.select("id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L, 5000000000L))
    // narrowing is refused
    intercept[IllegalArgumentException] {
      VersionedTable.widenColumn(spark, path, "id", org.apache.spark.sql.types.IntegerType)
    }
    // appending with a WIDER type than declared also widens automatically
    val path2 = freshDir()
    VersionedTable.commitAppend(ints, path2)
    VersionedTable.commitAppend(Seq((7000000000L, "auto")).toDF("id", "v"), path2)
    val auto = VersionedTable.read(spark, path2)
    assert(auto.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(auto.count() == 6)
  }

  test("rename/retype commits cross changes() and changesWithType() as no-ops") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 5), path) // v1
    VersionedTable.renameColumn(spark, path, "v", "label") // v2
    VersionedTable.commitAppend(
      (5 until 8).map(i => (i.toLong, s"row_$i")).toDF("id", "label"), path) // v3
    val delta = VersionedTable.changes(spark, path, 1L, 3L)
    assert(delta.count() == 3)
    assert(delta.columns.toSeq == Seq("id", "label"), "window reads in the TO-version's view")
    val cdf = VersionedTable.changesWithType(spark, path, 1L, 3L)
    assert(cdf.filter(col("_change_type") === "insert").count() == 3)
  }

  test("an add-column commit crosses changes() and changesWithType() as a no-op") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 5), path) // v1
    VersionedTable.addColumn(spark, path, "score",
      org.apache.spark.sql.types.DoubleType) // v2, metadata-only
    VersionedTable.commitAppend(
      (5 until 8).map(i => (i.toLong, s"row_$i", i * 1.5)).toDF("id", "v", "score"),
      path) // v3
    // an incremental consumer whose window crosses the ALTER must not throw
    val delta = VersionedTable.changes(spark, path, 1L, 3L)
    assert(delta.count() == 3)
    assert(delta.columns.toSeq == Seq("id", "v", "score"),
      "window reads in the TO-version's (widened) view")
    val cdf = VersionedTable.changesWithType(spark, path, 1L, 3L)
    assert(cdf.filter(col("_change_type") === "insert").count() == 3)
    assert(VersionedTable.changes(spark, path, 1L, 2L).count() == 0,
      "the add-column commit itself contributes no rows")
  }

  test("drop-column: CDC windows cross it; stats/check tangles refuse") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 5), path) // v1: (id, v)
    VersionedTable.dropColumn(spark, path, "v") // v2, metadata-only
    VersionedTable.commitAppend((5L until 8L).toDF("id"), path) // v3
    val delta = VersionedTable.changes(spark, path, 1L, 3L)
    assert(delta.columns.toSeq == Seq("id") && delta.count() == 3)
    assert(VersionedTable.read(spark, path).columns.toSeq == Seq("id"))
    // pre-drop version still reads the column
    assert(VersionedTable.read(spark, path, Some(1L)).columns.toSeq == Seq("id", "v"))
    // the last column cannot be dropped
    intercept[IllegalArgumentException](VersionedTable.dropColumn(spark, path, "id"))
    // resurrection guards: neither re-ADD nor an APPEND carrying the
    // dropped name may re-enter it (old files still hold its values)
    intercept[IllegalArgumentException](
      VersionedTable.addColumn(spark, path, "v", org.apache.spark.sql.types.StringType))
    val sneak = intercept[IllegalArgumentException](
      VersionedTable.commitAppend(Seq((99L, "zombie")).toDF("id", "v"), path))
    assert(sneak.getMessage.contains("resurrect"))
    // an overwrite retires the tombstones: the name becomes usable again
    VersionedTable.commitOverwrite(Seq((1L, "fresh")).toDF("id", "v"), path)
    assert(VersionedTable.read(spark, path).columns.toSeq == Seq("id", "v"))

    // a recorded stats column refuses (phantom pruning metadata)
    val p2 = freshDir()
    VersionedTable.commitAppend(batch(0, 5), p2, "id")
    val e1 = intercept[IllegalArgumentException](VersionedTable.dropColumn(spark, p2, "id"))
    assert(e1.getMessage.contains("file-skipping stats"))

    // a CHECK-referenced column refuses (dangling constraint)
    val p3 = freshDir()
    VersionedTable.commitAppend(batch(0, 5), p3)
    VersionedTable.addCheck(spark, p3, "v_nonnull", "v IS NOT NULL")
    val e2 = intercept[IllegalArgumentException](VersionedTable.dropColumn(spark, p3, "v"))
    assert(e2.getMessage.contains("CHECK constraint"))
  }

  test("schema evolution: mergeSchema read reconciles commits with a new nullable column") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 5), path)
    VersionedTable.commitAppend(
      (5 until 8).map(i => (i.toLong, s"row_$i", s"extra_$i")).toDF("id", "v", "tag"), path)
    val merged = VersionedTable.read(spark, path, mergeSchema = true)
    assert(merged.columns.toSet == Set("id", "v", "tag"))
    assert(merged.count() == 8)
    // old-commit rows surface the evolved column as null
    assert(merged.filter(col("tag").isNull).count() == 5)
  }

  test("a maintenance commit computed against a stale snapshot is refused, not committed") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    VersionedTable.commitAppend(batch(10, 20), path) // table is now at v2
    // A compact/deleteWhere that computed its kept-file list at v1 must NOT
    // publish it over v2 — that would silently drop v2's files.
    val err = intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.publish(spark, path, "compact", Seq.empty,
        carryForward = false, requiredParent = Some(1L))
    }
    assert(err.getMessage.contains("re-base"))
    assert(VersionedTable.versions(spark, path) == Seq(1L, 2L), "no stale commit landed")
    // with the CURRENT parent the same publish goes through
    val ok = VersionedTable.publish(spark, path, "compact", Seq.empty,
      carryForward = true, requiredParent = Some(2L))
    assert(ok.contains(3L))
  }

  test("deleteWhere matching every row leaves the table readable (and empty) at HEAD") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 5), path)
    val (v, deleted) = VersionedTable.deleteWhere(spark, path, col("id") >= 0)
    assert(v == 2L && deleted == 5L)
    val head = VersionedTable.read(spark, path)
    assert(head.count() == 0)
    assert(head.columns.toSeq == Seq("id", "v"), "schema survives an all-rows delete")
    // and the table keeps working afterwards
    VersionedTable.commitAppend(batch(100, 103), path)
    assert(VersionedTable.read(spark, path).count() == 3)
  }

  test("changesWithType crosses delete windows; replay reaches exactly the head state") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path) // v1
    VersionedTable.commitAppend(batch(10, 20), path) // v2
    VersionedTable.deleteWhere(spark, path, col("id").between(5, 14)) // v3
    VersionedTable.commitAppend(batch(20, 25), path) // v4
    val cdf = VersionedTable.changesWithType(spark, path, 1L, 4L)
    assert(cdf.columns.takeRight(2).toSeq == Seq("_change_type", "_commit_version"))
    val inserts = cdf.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq
    val deletes = cdf.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    assert(inserts == ((10L until 20L) ++ (20L until 25L)))
    assert(deletes == (5L to 14L))
    // replay contract: state@1 + inserts − deletes == state@4
    val replayed = (VersionedTable.read(spark, path, Some(1L)).select("id").as[Long].collect()
      ++ inserts).diff(deletes).sorted.toSeq
    val head = VersionedTable.read(spark, path).select("id").as[Long].collect().sorted.toSeq
    assert(replayed == head)
    // compaction inside the window contributes no row changes
    VersionedTable.compact(spark, path, targetRowsPerFile = 1000000) // v5
    val cdf2 = VersionedTable.changesWithType(spark, path, 4L, 5L)
    assert(cdf2.count() == 0)
    // tombstone files survive vacuum while their version is retained
    VersionedTable.vacuum(spark, path, keepLast = 3) // keeps v3 (delete), v4, v5
    val still = VersionedTable.changesWithType(spark, path, 3L, 4L)
    assert(still.filter(col("_change_type") === "insert").count() == 5)
    val cdfAcrossDelete = VersionedTable.changesWithType(spark, path, 3L, 3L)
    assert(cdfAcrossDelete.count() == 0) // empty window still answers
  }

  test("statsCol with JSON-hostile characters is refused before it corrupts a manifest") {
    val path = freshDir()
    val err = intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(batch(0, 5), path, statsCol = "id\"evil")
    }
    assert(err.getMessage.contains("statsCol"))
    assert(VersionedTable.versions(spark, path).isEmpty, "nothing committed")
  }

  test("deleteWhereDV marks rows deleted without touching a single data file") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 100), path) // v1
    VersionedTable.commitAppend(batch(100, 200), path) // v2
    val filesBefore = VersionedTable.dataFiles(spark, path).sorted
    // a SCATTERED predicate (every 10th row, hits every file) — the shape
    // that forces the rewrite form to rewrite the whole table
    val (v, deleted) = VersionedTable.deleteWhereDV(spark, path, col("id") % 10 === 0)
    assert(v == 3L && deleted == 20L)
    val head = VersionedTable.read(spark, path)
    assert(VersionedTable.dataFiles(spark, path).sorted == filesBefore, "no data file rewritten")
    val ids = head.select("id").as[Long].collect().sorted.toSeq
    assert(ids.size == 180 && !ids.exists(_ % 10 == 0))
    // time travel: the pre-delete snapshot still shows every row
    assert(VersionedTable.read(spark, path, Some(2L)).count() == 200)
    // a second DV delete composes with the first
    val (v2, d2) = VersionedTable.deleteWhereDV(spark, path, col("id") % 10 === 1)
    assert(v2 == 4L && d2 == 20L)
    val ids2 = VersionedTable.read(spark, path).select("id").as[Long].collect().sorted.toSeq
    assert(ids2.size == 160 && !ids2.exists(i => i % 10 == 0 || i % 10 == 1))
    // already-DV-deleted rows cannot re-match a new delete
    val (v3, d3) = VersionedTable.deleteWhereDV(spark, path, col("id") % 10 === 0)
    assert(v3 == 4L && d3 == 0L, "re-deleting DV'd rows must be a no-op")
    // readWhere composes with DVs
    assert(VersionedTable.readWhere(spark, path, "id", 0, 49).count() == 40)
  }

  test("DV deletes feed the CDF, survive vacuum, and never resurrect through maintenance") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 100), path) // v1
    VersionedTable.deleteWhereDV(spark, path, col("id") % 10 === 0) // v2
    VersionedTable.commitAppend(batch(100, 120), path) // v3
    // CDF: the DV delete emits row-level deletes from its tombstones
    val cdf = VersionedTable.changesWithType(spark, path, 1L, 3L)
    val dels = cdf.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    assert(dels == (0L until 100L by 10L))
    assert(cdf.filter(col("_change_type") === "insert").count() == 20)
    // vacuum retains the DV files of live versions: reads stay correct
    VersionedTable.vacuum(spark, path, keepLast = 2)
    assert(VersionedTable.read(spark, path).count() == 110)
    // compaction applies DVs — deleted rows must NOT resurrect into the
    // repacked files, and the compacted table reads identically
    val (_, rewritten) = VersionedTable.compact(spark, path, targetRowsPerFile = 1000000)
    assert(rewritten > 0)
    val after = VersionedTable.read(spark, path).select("id").as[Long].collect().sorted.toSeq
    assert(after.size == 110 && !after.exists(i => i < 100 && i % 10 == 0))
    // ...and the physical files no longer need the DV (migration complete):
    // a RAW read of the manifest's data files shows exactly the survivors
    val raw = spark.read.parquet(VersionedTable.dataFiles(spark, path): _*)
    assert(raw.count() == 110)
    // the rewrite delete also composes after DVs
    val (_, d) = VersionedTable.deleteWhere(spark, path, col("id") >= 110)
    assert(d == 10L)
    assert(VersionedTable.read(spark, path).count() == 100)
  }

  test("deleteWhere with no matches commits nothing; NULL-predicate rows survive") {
    val path = freshDir()
    VersionedTable.commitAppend(
      Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "v"), path)
    val (v0, d0) = VersionedTable.deleteWhere(spark, path, col("id") > 100)
    assert(v0 == 1L && d0 == 0L)
    assert(VersionedTable.versions(spark, path) == Seq(1L))
    // v = 'zzz' is NULL for id 2 — three-valued logic must KEEP that row
    val (v1, d1) = VersionedTable.deleteWhere(spark, path, col("v") === "a")
    assert(v1 == 2L && d1 == 1L)
    assert(VersionedTable.read(spark, path).select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
  }

  test("merge applies update + insert + delete in one commit; snapshot isolation holds") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 100), path) // v1
    // update 5..9 (new payloads), delete 0..4, insert 200..204
    val source = ((5 until 10).map(i => (i.toLong, s"upd_$i", false)) ++
      (0 until 5).map(i => (i.toLong, null: String, true)) ++
      (200 until 205).map(i => (i.toLong, s"new_$i", false)))
      .toDF("id", "v", "_del")
    val r = VersionedTable.merge(spark, path, source, Seq("id"), deleteFlag = Some("_del"))
    assert(r.version == 2L)
    assert(r.matchedRows == 10L, "5 updates + 5 deletes matched")
    assert(r.upsertRows == 10L, "5 update rows + 5 insert rows written")
    val rows = VersionedTable.read(spark, path)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows.size == 100, "100 - 5 deleted + 5 inserted")
    (0 until 5).foreach(i => assert(!rows.contains(i.toLong)))
    (5 until 10).foreach(i => assert(rows(i.toLong) == s"upd_$i"))
    (10 until 100).foreach(i => assert(rows(i.toLong) == s"row_$i"))
    (200 until 205).foreach(i => assert(rows(i.toLong) == s"new_$i"))
    // the pre-merge snapshot still reads the old payloads
    val v1 = VersionedTable.read(spark, path, Some(1L))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(v1.size == 100 && v1(5L) == "row_5" && v1.contains(0L))
  }

  test("merge rewrites only the files whose key range holds matched keys") {
    val path = freshDir()
    // three stats-carrying appends with disjoint key ranges
    VersionedTable.commitAppend(batch(0, 100), path, "id")
    VersionedTable.commitAppend(batch(100, 200), path, "id")
    VersionedTable.commitAppend(batch(200, 300), path, "id")
    val fsRoot = java.nio.file.Paths.get(path, "data")
    def dataFiles(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(fsRoot).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p))
        .map(p => fsRoot.relativize(p).toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = dataFiles()
    // matched keys live ONLY in the middle append's range; inserts are far right
    val source = ((150 until 160).map(i => (i.toLong, s"upd_$i")) ++
      (900 until 905).map(i => (i.toLong, s"new_$i"))).toDF("id", "v")
    val r = VersionedTable.merge(spark, path, source, Seq("id"))
    assert(r.matchedRows == 10L && r.upsertRows == 15L)
    assert(r.filesRewritten >= 1 && r.filesKept >= 2,
      s"only the middle commit's files rewrite (got $r)")
    // untouched commits' files are byte-identical (same path, same mtime)
    val after = dataFiles()
    val untouched = before.keySet.filter(after.contains)
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(before(f) == after(f), s"file $f was rewritten"))
    val rows = VersionedTable.read(spark, path)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows.size == 305)
    (150 until 160).foreach(i => assert(rows(i.toLong) == s"upd_$i"))
    assert(rows(0L) == "row_0" && rows(299L) == "row_299" && rows(900L) == "new_900")
  }

  test("merge CDF replays the window to exactly the head state") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 50), path) // v1
    val source = ((10 until 15).map(i => (i.toLong, s"upd_$i", false)) ++
      (40 until 45).map(i => (i.toLong, null: String, true)) ++
      (300 until 303).map(i => (i.toLong, s"new_$i", false)))
      .toDF("id", "v", "_del")
    VersionedTable.merge(spark, path, source, Seq("id"), deleteFlag = Some("_del")) // v2
    VersionedTable.commitAppend(batch(500, 505), path) // v3
    val cdf = VersionedTable.changesWithType(spark, path, 1L, 3L)
    // an update is delete(old) + insert(new); survivors of rewritten files
    // are data movement and must NOT appear
    val dels = cdf.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    assert(dels == ((10L until 15L) ++ (40L until 45L)))
    val ins = cdf.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ins == ((10L until 15L) ++ (300L until 303L) ++ (500L until 505L)))
    // replay: v1 + inserts − deletes == head (by full row identity)
    val v1 = VersionedTable.read(spark, path, Some(1L)).select("id", "v")
    val insRows = cdf.filter(col("_change_type") === "insert").select("id", "v")
    val delRows = cdf.filter(col("_change_type") === "delete").select("id", "v")
    val replayed = v1.unionByName(insRows).exceptAll(delRows)
      .as[(Long, String)].collect().sorted.toSeq
    val head = VersionedTable.read(spark, path).select("id", "v")
      .as[(Long, String)].collect().sorted.toSeq
    assert(replayed == head)
  }

  test("merge refuses duplicate source keys; NULL keys never match and insert") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path)
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, path, dup, Seq("id"))
    }
    assert(VersionedTable.versions(spark, path) == Seq(1L), "nothing committed")
    val withNull = Seq((Some(5L), "upd_5"), (None: Option[Long], "null_key"))
      .toDF("id", "v")
    val r = VersionedTable.merge(spark, path, withNull, Seq("id"))
    assert(r.matchedRows == 1L && r.upsertRows == 2L)
    val rows = VersionedTable.read(spark, path).count()
    assert(rows == 11, "null-keyed row inserts; matched row replaced")
    assert(VersionedTable.read(spark, path).filter(col("id").isNull).count() == 1)
  }

  // Interleaved layout: every file's [min,max] spans the whole domain, so
  // RANGE stats can prune nothing — the case blooms exist for.
  private def scatteredTable(): String = {
    val path = freshDir()
    val evens = (0 until 400 by 2).map(i => (i.toLong, s"row_$i")).toDF("id", "v").coalesce(1)
    val odds = (1 until 400 by 2).map(i => (i.toLong, s"row_$i")).toDF("id", "v").coalesce(1)
    VersionedTable.commitAppend(evens, path, Seq("id"), bloomCols = Seq("id"))
    VersionedTable.commitAppend(odds, path, Seq("id"), bloomCols = Seq("id"))
    path
  }

  test("bloom sidecars prune point probes that range stats cannot") {
    val path = scatteredTable()
    // ranges are useless here: both files span ~[0,399]
    assert(VersionedTable.filesForRanges(spark, path, Map("id" -> (42L, 42L))).size == 2)
    // the bloom knows 42 is in the evens file only
    val hit = VersionedTable.filesForKeys(spark, path, "id", Array(42L)).get
    assert(hit.size == 1, s"bloom should cut to the evens file, kept $hit")
    // probing a present odd and even key keeps both files
    assert(VersionedTable.filesForKeys(spark, path, "id", Array(42L, 43L)).get.size == 2)
    // absent keys: overwhelmingly pruned to zero (FPR ~0.3%)
    val absent = VersionedTable.filesForKeys(
      spark, path, "id", Array(100001L)).get
    assert(absent.size <= 1, s"absent key kept $absent")
    // exact point-lookup read
    val rows = VersionedTable.readKeys(spark, path, "id", Array(42L, 43L, 100001L))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows == Map(42L -> "row_42", 43L -> "row_43"))
    // a column with no blooms reports None (caller falls back)
    assert(VersionedTable.filesForKeys(spark, path, "v", Array(1L)).isEmpty)
  }

  test("bloom-less commits stay safe (never pruned); vacuum retains sidecars") {
    val path = scatteredTable()
    // third commit WITHOUT blooms: its file must always survive probes
    VersionedTable.commitAppend(
      Seq((1000L, "late")).toDF("id", "v").coalesce(1), path)
    val keep = VersionedTable.filesForKeys(spark, path, "id", Array(42L)).get
    assert(keep.size == 2, s"evens file + uncovered late file, got $keep")
    assert(VersionedTable.readKeys(spark, path, "id", Array(1000L))
      .select("v").as[String].collect().toSeq == Seq("late"))
    // vacuum to the latest version only: sidecars survive, probes still work
    VersionedTable.vacuum(spark, path, keepLast = 1)
    assert(VersionedTable.filesForKeys(spark, path, "id", Array(42L)).get.size == 2)
    assert(VersionedTable.readKeys(spark, path, "id", Array(42L)).count() == 1)
  }

  test("rewrite ops regenerate blooms: coverage survives merge, delete, and compaction") {
    val path = scatteredTable()
    // full coverage to start: an absent key prunes to zero files
    assert(VersionedTable.filesForKeys(spark, path, "id", Array(999983L)).get.isEmpty)
    // merge rewrites the evens file (tombstone 10..18, survivors re-staged)
    VersionedTable.merge(spark, path,
      (10 until 20 by 2).map(i => (i.toLong, s"upd_$i")).toDF("id", "v"), Seq("id"))
    // the rewritten survivors and upsert files got FRESH blooms: an absent
    // key still prunes to zero (no uncovered files leaked into the table)
    assert(VersionedTable.filesForKeys(spark, path, "id", Array(999983L)).get.isEmpty,
      "merge-staged files must be bloom-covered")
    // and a survivor key still resolves through the new sidecars
    assert(VersionedTable.readKeys(spark, path, "id", Array(42L))
      .select("v").as[String].collect().toSeq == Seq("row_42"))
    assert(VersionedTable.readKeys(spark, path, "id", Array(12L))
      .select("v").as[String].collect().toSeq == Seq("upd_12"))
    // deleteWhere rewrite keeps coverage too
    VersionedTable.deleteWhere(spark, path, col("id") === 43L)
    assert(VersionedTable.filesForKeys(spark, path, "id", Array(999983L)).get.isEmpty,
      "delete-staged files must be bloom-covered")
    // compaction repacks everything AND consolidates the sidecar set
    VersionedTable.compact(spark, path, targetRowsPerFile = 1000)
    assert(VersionedTable.filesForKeys(spark, path, "id", Array(999983L)).get.isEmpty,
      "compacted files must be bloom-covered")
    val rows = VersionedTable.readKeys(spark, path, "id", Array(42L, 12L, 43L))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows == Map(42L -> "row_42", 12L -> "upd_12"))
    assert(VersionedTable.read(spark, path).count() == 399)
  }

  test("merge prunes rewrite candidates through blooms on a scattered key") {
    val path = scatteredTable()
    // update 5 EVEN keys: ranges can't prune (both files span the domain),
    // blooms cut the rewrite to the evens file alone
    val source = Seq(10L, 20L, 30L, 40L, 50L).map(i => (i, s"upd_$i")).toDF("id", "v")
    val r = VersionedTable.merge(spark, path, source, Seq("id"))
    assert(r.matchedRows == 5L && r.upsertRows == 5L)
    assert(r.filesRewritten == 1, s"blooms should bound the rewrite to the evens file: $r")
    val rows = VersionedTable.read(spark, path)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows.size == 400)
    assert(rows(10L) == "upd_10" && rows(11L) == "row_11" && rows(42L) == "row_42")
  }

  test("replaceWhere swaps exactly the predicate's slice; untouched files carry by reference") {
    val path = freshDir()
    // three "daily" loads with disjoint key ranges
    VersionedTable.commitAppend(batch(0, 100), path, "id")
    VersionedTable.commitAppend(batch(100, 200), path, "id")
    VersionedTable.commitAppend(batch(200, 300), path, "id")
    val fsRoot = java.nio.file.Paths.get(path, "data")
    def dataFiles(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(fsRoot).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p))
        .map(p => fsRoot.relativize(p).toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = dataFiles()
    // reload "day 2" (keys 100..199) with corrected payloads, 20 rows fewer
    val reload = (100 until 180).map(i => (i.toLong, s"fix_$i")).toDF("id", "v")
    val r = VersionedTable.replaceWhere(
      spark, path, col("id").between(100, 199), reload)
    assert(r.version == 4L && r.rowsDeleted == 100L && r.rowsInserted == 80L)
    assert(r.filesRewritten >= 1 && r.filesKept >= 2, s"got $r")
    val untouched = before.keySet.filter(dataFiles().contains)
    assert(untouched.nonEmpty)
    untouched.foreach(f => assert(before(f) == dataFiles()(f), s"file $f was rewritten"))
    val rows = VersionedTable.read(spark, path)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows.size == 280)
    assert(rows(0L) == "row_0" && rows(250L) == "row_250")
    (100 until 180).foreach(i => assert(rows(i.toLong) == s"fix_$i"))
    (180 until 200).foreach(i => assert(!rows.contains(i.toLong)))
    // pre-replace snapshot intact; re-running the same reload is idempotent
    assert(VersionedTable.read(spark, path, Some(3L)).count() == 300)
    VersionedTable.replaceWhere(spark, path, col("id").between(100, 199), reload)
    assert(VersionedTable.read(spark, path).count() == 280)
  }

  test("replaceWhere refuses replacement rows outside the slice; CDF replays the window") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 50), path) // v1
    // a row outside the slice must abort BEFORE anything commits
    val escapee = Seq((10L, "in"), (99L, "out")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      VersionedTable.replaceWhere(spark, path, col("id") < 20, escapee)
    }
    assert(VersionedTable.versions(spark, path) == Seq(1L))
    // valid reload of the id<20 slice, then CDF replay across the window
    val reload = (0 until 15).map(i => (i.toLong, s"fix_$i")).toDF("id", "v")
    VersionedTable.replaceWhere(spark, path, col("id") < 20, reload) // v2
    val cdf = VersionedTable.changesWithType(spark, path, 1L, 2L)
    assert(cdf.filter(col("_change_type") === "delete").count() == 20)
    assert(cdf.filter(col("_change_type") === "insert").count() == 15)
    val v1 = VersionedTable.read(spark, path, Some(1L)).select("id", "v")
    val ins = cdf.filter(col("_change_type") === "insert").select("id", "v")
    val dels = cdf.filter(col("_change_type") === "delete").select("id", "v")
    val replayed = v1.unionByName(ins).exceptAll(dels)
      .as[(Long, String)].collect().sorted.toSeq
    val head = VersionedTable.read(spark, path).select("id", "v")
      .as[(Long, String)].collect().sorted.toSeq
    assert(replayed == head)
    // a predicate matching nothing is a scoped first load (plain insert)
    val r2 = VersionedTable.replaceWhere(
      spark, path, col("id").between(1000, 1004),
      (1000 until 1005).map(i => (i.toLong, s"new_$i")).toDF("id", "v"))
    assert(r2.rowsDeleted == 0L && r2.rowsInserted == 5L && r2.filesRewritten == 0)
    assert(VersionedTable.read(spark, path).count() == 50 - 20 + 15 + 5)
  }

  test("z-ordered compaction tightens per-file ranges on EVERY stats column") {
    // a 64x64 grid committed as shuffled sprawl: per-file (x,y) ranges are
    // useless until compaction imposes a layout
    def grid() = spark.range(64 * 64)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y",
        "concat('p_', id) AS payload")
      .orderBy(expr("hash(id)")) // destroy any natural clustering
    def build(zOrder: Boolean): String = {
      val path = freshDir()
      grid().repartition(16).write.mode("overwrite").parquet(path + "_stage")
      val staged = spark.read.parquet(path + "_stage")
      VersionedTable.commitAppend(staged, path, Seq("x", "y"))
      val (_, rewritten) =
        VersionedTable.compact(spark, path, targetRowsPerFile = 600, zOrder = zOrder)
      assert(rewritten >= 2, s"compaction must actually repack, rewrote $rewritten")
      path
    }
    val zPath = build(zOrder = true)
    val lexPath = build(zOrder = false)
    val nFiles = VersionedTable.read(spark, zPath).inputFiles.length
    assert(nFiles >= 4, s"want enough files for pruning to mean something, got $nFiles")
    // thin slab on the TRAILING dimension: lexicographic layout keeps y
    // ranges wide (every file spans most of y), z-order keeps them tight
    val zHit = VersionedTable.filesForRanges(spark, zPath, Map("y" -> (0L, 7L))).size
    val lexHit = VersionedTable.filesForRanges(spark, lexPath, Map("y" -> (0L, 7L))).size
    assert(zHit < lexHit,
      s"z-order should prune the trailing dim harder: z=$zHit lex=$lexHit of $nFiles")
    assert(zHit <= nFiles / 2, s"z-order slab read $zHit of $nFiles files")
    // the leading dimension still prunes too (z-order trades a little
    // leading-col sharpness for cross-column sharpness, never to zero)
    assert(VersionedTable.filesForRanges(spark, zPath, Map("x" -> (0L, 7L))).size < nFiles)
    // and the data is intact, readWhereAll exact on a 2-D cell
    val cell = VersionedTable.readWhereAll(
      spark, zPath, Map("x" -> (3L, 4L), "y" -> (5L, 6L)))
    assert(cell.count() == 4)
    assert(VersionedTable.read(spark, zPath).count() == 64 * 64)
  }

  test("scoped z-order compaction rewrites only the in-scope slab; 2-key pruning holds there") {
    // the realistic maintenance job: "re-cluster yesterday's partition on
    // (x, y)" — OPTIMIZE ... ZORDER ... WHERE. Two slabs of small shuffled
    // files; the scope predicate (not file size) must pick the victims.
    val path = freshDir()
    def slab(x0: Long) = spark.range(64 * 64)
      .selectExpr(s"id % 64 + $x0 AS x", "id DIV 64 AS y", "concat('p_', id) AS payload")
      .orderBy(expr("hash(id)")) // destroy natural clustering
    def commitShuffled(x0: Long): Unit = {
      val stage = path + s"_stage_$x0"
      slab(x0).repartition(8).write.mode("overwrite").parquet(stage)
      VersionedTable.commitAppend(spark.read.parquet(stage), path, Seq("x", "y"))
    }
    commitShuffled(0) // the old slab, x in [0, 63] — equally small files
    commitShuffled(64) // "yesterday", x in [64, 127]
    def rel(full: Seq[String]) = full.map(_.stripPrefix(s"$path/data/")).toSet
    val oldSlab = rel(VersionedTable.dataFiles(
      spark, path, Some(VersionedTable.versions(spark, path).head)))
    val (_, rewritten) = VersionedTable.compact(
      spark, path, targetRowsPerFile = 600, zOrder = true,
      scope = Some(("x", 64L, 127L)))
    assert(rewritten == 8, s"exactly yesterday's 8 small files, got $rewritten")
    val after = rel(VersionedTable.dataFiles(spark, path))
    assert(oldSlab.subsetOf(after),
      "out-of-scope files must survive the scoped rewrite BY NAME (zero bytes moved)")
    val fresh = after -- oldSlab
    assert(fresh.size >= 4, s"want a repacked slab with several files, got ${fresh.size}")
    // two-key pruning on the REWRITTEN slab: an (x, y) box inside
    // yesterday's range prunes the old slab via x stats and, thanks to
    // the Morton layout, hits only a corner of the fresh files
    val hit = VersionedTable.filesForRanges(
      spark, path, Map("x" -> (64L, 71L), "y" -> (0L, 7L))).toSet
    assert(hit.subsetOf(fresh), s"old slab must prune away entirely: ${hit -- fresh}")
    assert(hit.size <= fresh.size / 2,
      s"z-order box should prune the fresh slab: hit ${hit.size} of ${fresh.size}")
    // rows intact; an exact 2-D cell reads correctly from the new layout
    assert(VersionedTable.read(spark, path).count() == 2L * 64 * 64)
    assert(VersionedTable.readWhereAll(
      spark, path, Map("x" -> (67L, 68L), "y" -> (5L, 6L))).count() == 4)
  }

  test("merge composes with deletion vectors: DV-deleted rows cannot re-match") {
    val path = freshDir()
    // one data file, so the merge's rewrite provably migrates the DV out
    VersionedTable.commitAppend(batch(0, 100).coalesce(1), path) // v1
    VersionedTable.deleteWhereDV(spark, path, col("id") === 7L) // v2
    // id 7 is DV-deleted: the merge must treat it as ABSENT (insert, not update)
    val source = Seq((7L, "reborn"), (8L, "upd_8")).toDF("id", "v")
    val r = VersionedTable.merge(spark, path, source, Seq("id"))
    assert(r.matchedRows == 1L, "only id 8 matches; DV-deleted 7 is gone")
    val rows = VersionedTable.read(spark, path)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(rows.size == 100 && rows(7L) == "reborn" && rows(8L) == "upd_8")
    // the rewrite migrated the DV out: raw read of the manifest's data
    // files equals the logical read (no anti-join needed anymore)
    val raw = spark.read.parquet(VersionedTable.dataFiles(spark, path): _*)
    assert(raw.count() == 100)
  }

  test("restore rolls HEAD back metadata-only; intervening versions still time-travel") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path) // v1
    VersionedTable.commitAppend(batch(10, 15), path) // v2
    VersionedTable.deleteWhere(spark, path, col("id") < 5) // v3: the "bad batch"
    val filesAtV2 = VersionedTable.dataFiles(spark, path, Some(2L)).sorted
    val rv = VersionedTable.restore(spark, path, 2L)
    assert(rv == 4L)
    // HEAD is v2's state again, by re-reference — not a rewrite
    assert(VersionedTable.dataFiles(spark, path).sorted == filesAtV2,
      "restore must re-reference v2's files, not copy them")
    assert(
      VersionedTable.read(spark, path).select("id").as[Long].collect().sorted
        .sameElements(0L until 15L))
    // the rolled-past delete still time-travels
    assert(VersionedTable.read(spark, path, Some(3L)).count() == 10)
    assert(VersionedTable.history(spark, path).last.operation == "restore")
  }

  test("restore re-instates the target's deletion vectors and file stats") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 100).coalesce(1), path, "id") // v1, stats on id
    VersionedTable.deleteWhereDV(spark, path, col("id") === 7L) // v2
    VersionedTable.commitOverwrite(batch(500, 503), path) // v3 retires the DV
    VersionedTable.restore(spark, path, 2L) // v4
    val ids = VersionedTable.read(spark, path).select("id").as[Long].collect().sorted
    assert(ids.length == 99 && !ids.contains(7L), "v2's DV must suppress id 7 again")
    // v1's file stats rode along: a disjoint range prunes to zero files
    assert(VersionedTable.filesForRanges(spark, path, Map("id" -> (1000L, 2000L))).isEmpty)
  }

  test("restore re-instates the target's schema view; later renames roll back") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 5), path) // v1: (id, v)
    VersionedTable.renameColumn(spark, path, "v", "label") // v2
    VersionedTable.restore(spark, path, 1L) // v3
    assert(VersionedTable.read(spark, path).columns.toSeq == Seq("id", "v"))
    // and forward again: restoring the post-rename snapshot re-applies it
    VersionedTable.restore(spark, path, 2L) // v4
    assert(VersionedTable.read(spark, path).columns.toSeq == Seq("id", "label"))
  }

  test("restore carries the txn map: a committed stream batch stays committed") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path) // v1
    VersionedTable.commitStreamBatch(batch(10, 12), path, "ingest", 5L) // v2
    VersionedTable.restore(spark, path, 1L) // v3: rows of batch 5 rolled back...
    // ...but the batch REMAINS committed — a crash-replay must no-op, not
    // double-apply into the restored table
    assert(VersionedTable.commitStreamBatch(batch(10, 12), path, "ingest", 5L).isEmpty)
    assert(VersionedTable.lastCommittedBatch(spark, path, "ingest").contains(5L))
  }

  test("restore refuses vacuumed versions; change feeds refuse restore windows") {
    val path = freshDir()
    VersionedTable.commitAppend(batch(0, 10), path) // v1
    VersionedTable.commitOverwrite(batch(100, 105), path) // v2
    VersionedTable.commitAppend(batch(105, 108), path) // v3
    VersionedTable.vacuum(spark, path, keepLast = 2)
    intercept[IllegalArgumentException] {
      VersionedTable.restore(spark, path, 1L)
    }
    VersionedTable.restore(spark, path, 2L) // v4
    // a window crossing the restore has no row diff: both feeds refuse
    intercept[IllegalArgumentException] {
      VersionedTable.changes(spark, path, 3L, 4L)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.changesWithType(spark, path, 3L, 4L)
    }
  }

  test("a mirror crossing a restore heals by full resync") {
    val src = freshDir()
    val dst = freshDir()
    VersionedTable.commitAppend(batch(0, 10), src) // v1
    assert(VersionedTable.mirrorChanges(spark, src, dst, "m").contains((0L, 1L)))
    VersionedTable.commitAppend(batch(10, 15), src) // v2
    VersionedTable.restore(spark, src, 1L) // v3
    assert(VersionedTable.mirrorChanges(spark, src, dst, "m").contains((1L, 3L)))
    assert(
      VersionedTable.read(spark, dst).select("id").as[Long].collect().sorted
        .sameElements(0L until 10L))
  }
}
