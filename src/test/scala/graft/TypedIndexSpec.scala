package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** The TYPED (stats3) channel through the Catalyst read path
  * (`VersionedTable.table` + [[graft.io.VersionedFileIndex]]): string /
  * date / timestamp / double predicates — DataFrame or SQL — must prune
  * files at planning time from the typed manifest ranges, string point
  * lookups must prune through the hashed (#s:) bloom sidecars, and a
  * file without typed stats must always survive (safety over
  * sharpness). Also pins the fixed silent-wrong-result hazard: a
  * TIMESTAMP literal (epoch MICROS) must never be compared against the
  * long channel's epoch-second ranges. */
class TypedIndexSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("vt_typed_idx").toString + "/tbl"

  /** Total parquet files the executed plan's file scans actually listed
    * (post-pruning), AQE-aware. */
  private def filesScanned(df: DataFrame): Long = {
    val root = df.queryExecution.executedPlan
    root.executeCollect()
    val finals = root +: root.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    finals.flatMap(_.collect { case s: FileSourceScanExec => s })
      .map(_.metrics("numFiles").value).sum
  }

  test("timestamp predicate through table() prunes correctly (micros-vs-seconds regression)") {
    val path = freshDir()
    // four single-file commits of 25 hours each, stats on ts
    (0 until 4).foreach { b =>
      val df = spark.range(b * 25L, (b + 1) * 25L)
        .select(col("id"),
          timestamp_seconds(lit(1700000000L) + col("id") * 3600).as("ts"))
        .coalesce(1)
      VersionedTable.commitAppend(df, path, Seq("ts"))
    }
    def t = VersionedTable.table(spark, path)
    val cut = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L + 50 * 3600))
    // correctness first: the pre-typed index silently returned 0 rows here
    assert(t.filter(col("ts") >= lit(cut)).count() == 50)
    // and the typed channel prunes: hours 50.. live in commits 3 and 4
    assert(filesScanned(t.filter(col("ts") >= lit(cut))) == 2)
    // point equality inside one commit
    val one = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L + 10 * 3600))
    assert(t.filter(col("ts") === lit(one)).count() == 1)
    assert(filesScanned(t.filter(col("ts") === lit(one))) == 1)
  }

  test("string predicates prune through table(): range, =, prefix, SQL; stats-less file survives") {
    val path = freshDir()
    // four range-disjoint single-file commits keyed D00000000..D00000399
    (0 until 4).foreach { b =>
      val df = (b * 100 until (b + 1) * 100)
        .map(i => (f"D$i%08d", i)).toDF("doc_key", "v").coalesce(1)
      VersionedTable.commitAppend(df, path, Seq("doc_key"))
    }
    def t = VersionedTable.table(spark, path)
    // range: [150, 250] spans commits 2 and 3
    val r = t.filter(col("doc_key").between("D00000150", "D00000250"))
    assert(r.count() == 101)
    assert(filesScanned(
      t.filter(col("doc_key").between("D00000150", "D00000250"))) == 2)
    // equality: one file
    assert(filesScanned(t.filter(col("doc_key") === "D00000042")) == 1)
    assert(t.filter(col("doc_key") === "D00000042").count() == 1)
    // prefix: D000001 covers 100..199 -> exactly commit 2
    val p = t.filter(col("doc_key").startsWith("D000001"))
    assert(p.count() == 100)
    assert(filesScanned(t.filter(col("doc_key").startsWith("D000001"))) == 1)
    // SQL path prunes identically
    t.createOrReplaceTempView("vt_typed_sql")
    assert(spark.sql(
      "SELECT count(*) FROM vt_typed_sql WHERE doc_key = 'D00000042'")
      .as[Long].head() == 1)
    assert(filesScanned(spark.sql(
      "SELECT * FROM vt_typed_sql WHERE doc_key BETWEEN 'D00000150' AND 'D00000250'")) == 2)
    // stats-less control: a commit WITHOUT stats, rows inside the range —
    // pruning must keep the new file (never drop uncovered files)
    VersionedTable.commitAppend(
      Seq(("D00000200", 9999)).toDF("doc_key", "v").coalesce(1), path)
    assert(VersionedTable.table(spark, path)
      .filter(col("doc_key").between("D00000150", "D00000250")).count() == 102)
    assert(filesScanned(VersionedTable.table(spark, path)
      .filter(col("doc_key").between("D00000150", "D00000250"))) == 3)
  }

  test("string point lookups prune through hashed (#s:) bloom sidecars") {
    val path = freshDir()
    // two interleaved commits: both span the full key range, so only the
    // hashed blooms can separate them
    val evens = (0 until 400 by 2).map(i => (f"D$i%08d", i)).toDF("doc_key", "v").coalesce(1)
    val odds = (1 until 400 by 2).map(i => (f"D$i%08d", i)).toDF("doc_key", "v").coalesce(1)
    VersionedTable.commitAppend(evens, path, Seq("doc_key"), bloomCols = Seq("doc_key"))
    VersionedTable.commitAppend(odds, path, Seq("doc_key"), bloomCols = Seq("doc_key"))
    def t = VersionedTable.table(spark, path)
    assert(filesScanned(t.filter(col("doc_key") === "D00000042")) == 1)
    assert(t.filter(col("doc_key") === "D00000042").count() == 1)
    // absent key: ranges keep both, blooms reject both
    assert(filesScanned(t.filter(col("doc_key") === "Zmissing")) == 0)
    // IN with one even + one odd key needs both files
    assert(t.filter(col("doc_key").isin("D00000042", "D00000043")).count() == 2)
    // programmatic twin: readKeysString
    val rk = VersionedTable.readKeysString(
      spark, path, "doc_key", Array("D00000042", "D00000398"))
    assert(rk.count() == 2)
    assert(VersionedTable.filesForKeysString(
      spark, path, "doc_key", Array("D00000042")).get.size == 1)
    // rewrite ops REGENERATE hashed sidecars (bloomColsOf strips the
    // #s: scheme marker back to the logical column): after compaction
    // the new file must still be bloom-covered
    VersionedTable.compact(spark, path, targetRowsPerFile = 500)
    assert(VersionedTable.bloomColumns(spark, path) == Seq("doc_key"))
    assert(filesScanned(VersionedTable.table(spark, path)
      .filter(col("doc_key") === "Zmissing")) == 0)
    assert(VersionedTable.table(spark, path)
      .filter(col("doc_key") === "D00000042").count() == 1)
  }

  test("double predicates prune through table(): fractional threshold, float col, SQL") {
    val path = freshDir()
    // four score bands: [0,0.25), [0.25,0.5), [0.5,0.75), [0.75,1.0)
    (0 until 4).foreach { b =>
      val df = spark.range(100)
        .select(col("id"),
          (lit(b * 0.25) + col("id").cast("double") * 0.0025).as("score"),
          (lit(b * 0.25) + col("id").cast("double") * 0.0025)
            .cast("float").as("fscore"))
        .coalesce(1)
      VersionedTable.commitAppend(df, path, Seq("score", "fscore"))
    }
    def t = VersionedTable.table(spark, path)
    // fractional threshold mid-gap between sample points (step 0.0025):
    // > 0.74125 keeps ids 97..99 of band 3 plus all of band 4
    assert(t.filter(col("score") > 0.74125).count() == 103)
    assert(filesScanned(t.filter(col("score") > 0.74125)) == 2)
    // tight fractional window inside one band
    assert(filesScanned(t.filter(col("score").between(0.30, 0.40))) == 1)
    // the long channel alone would TRUNCATE 0.74125 -> can't separate
    // bands; the typed channel must. Float col prunes through its cast:
    assert(filesScanned(t.filter(col("fscore") > 0.76f)) == 1)
    // SQL
    t.createOrReplaceTempView("vt_typed_dbl")
    assert(filesScanned(spark.sql(
      "SELECT * FROM vt_typed_dbl WHERE score >= 0.75")) == 1)
    // programmatic typed read agrees
    assert(VersionedTable.readWhereTyped(
      spark, path, Map("score" -> (0.75, 1.0))).count() == 100)
    assert(VersionedTable.filesForRangesTyped(
      spark, path, Map("score" -> (0.75, 1.0))).size == 1)
  }

  test("date predicates prune through table()") {
    val path = freshDir()
    (0 until 4).foreach { b =>
      val df = spark.range(30)
        .select(col("id"),
          date_add(lit(java.sql.Date.valueOf("2024-01-01")),
            (lit(b * 30) + col("id")).cast("int")).as("d"))
        .coalesce(1)
      VersionedTable.commitAppend(df, path, Seq("d"))
    }
    def t = VersionedTable.table(spark, path)
    val cut = java.sql.Date.valueOf("2024-03-01") // day 60
    assert(t.filter(col("d") >= lit(cut)).count() == 60)
    assert(filesScanned(t.filter(col("d") >= lit(cut))) == 2)
    assert(filesScanned(
      t.filter(col("d") === lit(java.sql.Date.valueOf("2024-01-15")))) == 1)
  }

  test("decimal predicates prune through table(): 'C' slot, sharp sub-integer bounds") {
    val path = freshDir()
    def bd(s: String) = new java.math.BigDecimal(s)
    // four price bands of one currency unit each: [10.00,10.99] .. [13.00,13.99]
    // built from INTEGER arithmetic (never through double) so the recorded
    // bounds are exact by construction
    (0 until 4).foreach { b =>
      val df = spark.range(100)
        .select(col("id"),
          concat(lit((10 + b).toString), lit("."),
            lpad((col("id") % 100).cast("string"), 2, "0"))
            .cast("decimal(12,2)").as("price"))
        .coalesce(1)
      VersionedTable.commitAppend(df, path, Seq("price"))
    }
    def t = VersionedTable.table(spark, path)
    // sub-integer threshold: the long channel truncates every band to an
    // integer range, only the 'C' slot can separate 12.49 from 12.50
    assert(t.filter(col("price") > lit(bd("12.49"))).count() == 150)
    assert(filesScanned(t.filter(col("price") > lit(bd("12.49")))) == 2)
    assert(filesScanned(
      t.filter(col("price").between(lit(bd("11.25")), lit(bd("11.75"))))) == 1)
    // integral literal on a decimal column prunes (promotion is exact)
    assert(filesScanned(t.filter(col("price") >= 13)) == 1)
    assert(t.filter(col("price") >= 13).count() == 100)
    // SQL decimal literal
    t.createOrReplaceTempView("vt_typed_dec")
    assert(filesScanned(spark.sql(
      "SELECT * FROM vt_typed_dec WHERE price BETWEEN 10.50 AND 10.60")) == 1)
    // programmatic typed read agrees (BigDecimal and string bounds)
    assert(VersionedTable.readWhereTyped(
      spark, path, Map("price" -> (bd("13.00"), bd("13.99")))).count() == 100)
    assert(VersionedTable.filesForRangesTyped(
      spark, path, Map("price" -> ("12.50", "12.99"))).size == 1)
    // scale is representation, not identity: 12.5 == 12.50
    assert(filesScanned(t.filter(col("price") === lit(bd("12.5")))) == 1)
    assert(t.filter(col("price") === lit(bd("12.5"))).count() == 1)
  }

  test("decimal pruning survives compaction; null IN-list literals decline to prune") {
    val path = freshDir()
    def bd(s: String) = new java.math.BigDecimal(s)
    (0 until 4).foreach { b =>
      val df = (b * 100 until (b + 1) * 100)
        .map(i => (i.toLong, f"${10 + b}%d.${i % 100}%02d"))
        .toDF("id", "ps")
        .select(col("id"), col("ps").cast("decimal(12,2)").as("price"))
        .coalesce(1)
      VersionedTable.commitAppend(df, path, Seq("id", "price"))
    }
    VersionedTable.compact(spark, path, targetRowsPerFile = 200)
    def t = VersionedTable.table(spark, path)
    val total = filesScanned(t)
    // compacted files re-recorded the 'C' slot
    assert(filesScanned(t.filter(col("price") > lit(bd("12.49")))) < total)
    assert(t.filter(col("price") > lit(bd("12.49"))).count() == 150)
    // regression (r17 ADVICE): a NULL inside a pushed-down IN list must
    // decline to prune, not NPE at planning time — on the long channel...
    t.createOrReplaceTempView("vt_dec_nullin")
    assert(spark.sql(
      "SELECT * FROM vt_dec_nullin WHERE id IN (42, NULL)").count() == 1)
    // ...and on the typed channels
    assert(spark.sql(
      "SELECT * FROM vt_dec_nullin WHERE price IN (CAST(10.42 AS DECIMAL(12,2)), NULL)")
      .count() >= 1)
    assert(t.filter(col("id").isin(7, null)).count() == 1)
  }

  test("typed pruning survives compaction and purge lifecycle") {
    val path = freshDir()
    (0 until 4).foreach { b =>
      val df = (b * 100 until (b + 1) * 100)
        .map(i => (f"D$i%08d", i.toDouble / 400.0)).toDF("doc_key", "score").coalesce(1)
      VersionedTable.commitAppend(df, path, Seq("doc_key", "score"))
    }
    VersionedTable.compact(spark, path, targetRowsPerFile = 200)
    def t = VersionedTable.table(spark, path)
    assert(t.count() == 400)
    // compacted files re-recorded typed stats: the string cut still works
    val scanned = filesScanned(t.filter(col("doc_key") === "D00000042"))
    val total = filesScanned(t)
    assert(scanned < total, s"expected a cut, scanned=$scanned of $total")
    assert(t.filter(col("doc_key") === "D00000042").count() == 1)
    // and the double channel re-recorded too
    assert(filesScanned(t.filter(col("score") > 0.9)) < total)
    assert(t.filter(col("score") > 0.9).count() == 400 - 361)
  }
}
