package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** SQL DML against [[graft.sources.VtCatalog]] tables
  * ([[graft.sources.VtDmlRule]]): MERGE INTO and DELETE FROM statement
  * text must hit the library's merge/deleteWhere commit paths with exact
  * SQL semantics — first-match-wins action order, conditional
  * delete/insert, unmatched-row drops — and unsupported shapes must fail
  * fast, never silently mis-merge. */
class VtDmlSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String = {
    val path = java.nio.file.Files.createTempDirectory("vtdml").toString + "/tbl"
    VersionedTable.commitAppend(
      (0L until 100L).map(i => (i, s"s$i", i * 10L)).toDF("id", "label", "amount"),
      path, "id")
    path
  }

  private def cat(path: String): String = {
    spark.conf.set("spark.sql.catalog.vtdml", classOf[graft.sources.VtCatalog].getName)
    s"vtdml.`$path`"
  }

  private def snapshot(path: String): Map[Long, (String, Long)] =
    VersionedTable.read(spark, path)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("MERGE: CDC batch with conditional delete, update-star, guarded insert") {
    val path = freshTable()
    Seq(
      (5L, "u5", 555L, "U"),     // matched update
      (7L, "ignored", 0L, "D"),  // matched delete
      (200L, "n200", 2000L, "I"),// unmatched insert
      (300L, "skip", 0L, "D"))   // unmatched delete row: must NOT insert
      .toDF("id", "label", "amount", "op")
      .createOrReplaceTempView("vtdml_batch")
    spark.sql(
      s"""MERGE INTO ${cat(path)} t USING vtdml_batch b
         |ON t.id = b.id
         |WHEN MATCHED AND b.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND b.op <> 'D' THEN INSERT *
         |""".stripMargin)
    val after = snapshot(path)
    assert(after(5L) == (("u5", 555L)))
    assert(!after.contains(7L))
    assert(after(200L) == (("n200", 2000L)))
    assert(!after.contains(300L))
    assert(after.size == 100 - 1 + 1)
    assert(after(6L) == (("s6", 60L))) // untouched survivor
  }

  test("MERGE: matched row matching no action leaves the target row alone") {
    val path = freshTable()
    Seq((3L, "u3", 333L, true), (4L, "u4", 444L, false))
      .toDF("id", "label", "amount", "apply")
      .createOrReplaceTempView("vtdml_cond")
    spark.sql(
      s"""MERGE INTO ${cat(path)} t USING vtdml_cond b
         |ON t.id = b.id
         |WHEN MATCHED AND b.apply THEN UPDATE SET *
         |""".stripMargin)
    val after = snapshot(path)
    assert(after(3L) == (("u3", 333L)))
    assert(after(4L) == (("s4", 40L))) // condition false: untouched
    assert(after.size == 100)
  }

  test("MERGE: UPDATE-before-DELETE order is first-match-wins") {
    val path = freshTable()
    Seq((10L, "u10", 1L, true), (11L, "u11", 1L, false))
      .toDF("id", "label", "amount", "upd")
      .createOrReplaceTempView("vtdml_order")
    spark.sql(
      s"""MERGE INTO ${cat(path)} t USING vtdml_order b
         |ON t.id = b.id
         |WHEN MATCHED AND b.upd THEN UPDATE SET *
         |WHEN MATCHED THEN DELETE
         |""".stripMargin)
    val after = snapshot(path)
    assert(after(10L) == (("u10", 1L))) // update won
    assert(!after.contains(11L))        // fell through to delete
  }

  test("MERGE fast path: unconditional UPDATE SET * + INSERT * upserts without a key scan") {
    val path = freshTable()
    Seq((5L, "u5", 500L), (200L, "n200", 2000L))
      .toDF("id", "label", "amount")
      .createOrReplaceTempView("vtdml_fast")
    spark.sql(
      s"""MERGE INTO ${cat(path)} t USING vtdml_fast b
         |ON t.id = b.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val after = snapshot(path)
    assert(after(5L) == (("u5", 500L)))
    assert(after(200L) == (("n200", 2000L)))
    assert(after.size == 101)
    assert(after(6L) == (("s6", 60L)))
  }

  test("DELETE FROM with a non-V1-translatable predicate (modulo)") {
    val path = freshTable()
    spark.sql(s"DELETE FROM ${cat(path)} WHERE id % 10 = 3")
    val ids = snapshot(path).keySet
    assert(ids.size == 90 && !ids.exists(_ % 10 == 3))
  }

  test("DELETE FROM with a translatable predicate and column expr") {
    val path = freshTable()
    spark.sql(s"DELETE FROM ${cat(path)} WHERE amount >= 900 AND label != 's95'")
    val ids = snapshot(path).keySet
    assert(ids == ((0L until 90L).toSet + 95L))
  }

  test("unsupported shapes fail fast") {
    val path = freshTable()
    Seq((1L, "x", 1L)).toDF("id", "label", "amount")
      .createOrReplaceTempView("vtdml_bad")
    def mustFail(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(fragment), s"got: ${e.getMessage}")
    }
    mustFail(
      s"""MERGE INTO ${cat(path)} t USING vtdml_bad b ON t.id = b.id
         |WHEN MATCHED THEN UPDATE SET label = b.label""".stripMargin,
      "must assign every target column")
    mustFail(
      s"""MERGE INTO ${cat(path)} t USING vtdml_bad b ON t.id < b.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
      "conjunction of target-column = source-expression")
    mustFail(
      s"""MERGE INTO ${cat(path)} t USING vtdml_bad b ON t.id = b.id
         |WHEN MATCHED AND t.amount > 5 THEN DELETE""".stripMargin,
      "reference the source only")
    mustFail(
      s"""MERGE INTO ${cat(path)} t USING vtdml_bad b ON t.id = b.id
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin,
      "NOT MATCHED BY SOURCE")
    mustFail(
      s"""MERGE INTO ${cat(path)} t USING vtdml_bad b ON t.id = b.id
         |WHEN MATCHED THEN UPDATE SET id = b.id + 1, label = b.label, amount = b.amount""".stripMargin,
      "must not reassign merge key")
    // INSERT reassigning the key would keyed-REPLACE an existing row
    // that happens to carry the new key, instead of inserting alongside
    mustFail(
      s"""MERGE INTO ${cat(path)} t USING vtdml_bad b ON t.id = b.id
         |WHEN NOT MATCHED THEN INSERT (id, label, amount) VALUES (b.id + 10, b.label, b.amount)""".stripMargin,
      "INSERT must not reassign merge key")
  }

  test("MERGE in dv mode: same result as cow, zero files rewritten") {
    val path = freshTable()
    val before = VersionedTable.dataFiles(spark, path, Some(1L)).toSet
    Seq((5L, "u5", 555L, "U"), (7L, "x", 0L, "D"), (200L, "n200", 2000L, "I"))
      .toDF("id", "label", "amount", "op")
      .createOrReplaceTempView("vtdml_dv")
    spark.conf.set("spark.graft.dml.merge.mode", "dv")
    try spark.sql(
      s"""MERGE INTO ${cat(path)} t USING vtdml_dv b
         |ON t.id = b.id
         |WHEN MATCHED AND b.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND b.op <> 'D' THEN INSERT *
         |""".stripMargin)
    finally spark.conf.unset("spark.graft.dml.merge.mode")
    val after = snapshot(path)
    assert(after(5L) == (("u5", 555L)) && !after.contains(7L) &&
      after(200L) == (("n200", 2000L)) && after.size == 100)
    val v = VersionedTable.versions(spark, path).last
    assert(before.subsetOf(VersionedTable.dataFiles(spark, path, Some(v)).toSet),
      "dv-mode MERGE must not rewrite existing files")
  }

  test("UPDATE: COW file surgery with self-referencing assignment") {
    val path = freshTable()
    val v0 = VersionedTable.versions(spark, path).last
    spark.sql(
      s"UPDATE ${cat(path)} SET amount = amount * 2, label = concat(label, '!') " +
        "WHERE id % 10 = 4")
    val after = snapshot(path)
    assert(after.size == 100)
    assert(after(4L) == (("s4!", 80L)))
    assert(after(14L) == (("s14!", 280L)))
    assert(after(5L) == (("s5", 50L))) // untouched
    // CDF: the update replays as delete+insert pairs (10 each)
    val types = VersionedTable.changesWithType(spark, path, v0, v0 + 1)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(types == Map("insert" -> 10L, "delete" -> 10L))
  }

  test("UPDATE in dv mode: same result, zero files rewritten") {
    val path = freshTable()
    val before = VersionedTable.dataFiles(spark, path, Some(1L)).toSet
    spark.conf.set("spark.graft.dml.update.mode", "dv")
    try spark.sql(s"UPDATE ${cat(path)} SET amount = amount + 5 WHERE id % 25 = 0")
    finally spark.conf.unset("spark.graft.dml.update.mode")
    val after = snapshot(path)
    assert(after(0L) == (("s0", 5L)) && after(25L) == (("s25", 255L)))
    assert(after.size == 100)
    val v2 = VersionedTable.versions(spark, path).last
    assert(before.subsetOf(VersionedTable.dataFiles(spark, path, Some(v2)).toSet))
  }

  test("UPDATE: no matching rows is a no-op version-wise") {
    val path = freshTable()
    val v0 = VersionedTable.versions(spark, path).last
    spark.sql(s"UPDATE ${cat(path)} SET amount = 0 WHERE id > 10000")
    assert(VersionedTable.versions(spark, path).last == v0)
  }

  test("TRUNCATE TABLE empties the table through the SupportsDelete seam") {
    val path = freshTable()
    spark.sql(s"TRUNCATE TABLE ${cat(path)}")
    assert(VersionedTable.read(spark, path).count() == 0L)
    // the table stays live (readable at HEAD) and appendable
    VersionedTable.commitAppend(
      Seq((1000L, "x", 1L)).toDF("id", "label", "amount"), path)
    assert(snapshot(path).keySet == Set(1000L))
  }

  test("MERGE bootstraps CDF + exactly-once machinery (commit is a real version)") {
    val path = freshTable()
    val v0 = VersionedTable.versions(spark, path).last
    Seq((1L, "one", 111L)).toDF("id", "label", "amount")
      .createOrReplaceTempView("vtdml_v")
    spark.sql(
      s"""MERGE INTO ${cat(path)} t USING vtdml_v b ON t.id = b.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(VersionedTable.versions(spark, path).last == v0 + 1)
    // row-level CDF window over the merge: exactly one update pair
    val cdf = VersionedTable.changesWithType(spark, path, v0, v0 + 1)
    val types = cdf.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(types == Map("insert" -> 1L, "delete" -> 1L))
  }
}
