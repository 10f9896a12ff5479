package graft

import org.apache.spark.sql.functions._

import graft.ops.Upsert

class UpsertSpec extends SparkSuite {
  import spark.implicits._

  test("updates replace, inserts add, untouched rows survive exactly once") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val merged = Upsert.merge(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(merged == Seq(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("composite keys match on the full tuple") {
    val base = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "s", "v")
    val updates = Seq((1L, "x", 9.0)).toDF("k", "s", "v")
    val merged = Upsert.merge(base, updates, Seq("k", "s"))
      .orderBy("k", "s").as[(Long, String, Double)].collect().toSeq
    assert(merged == Seq((1L, "x", 9.0), (1L, "y", 2.0)))
  }

  test("a duplicate-keyed update batch keeps its own multiplicity (caller contract)") {
    val base = Seq((1L, "a", 10.0)).toDF("k", "s", "v")
    val updates = Seq((1L, "u1", 1.0), (1L, "u2", 2.0)).toDF("k", "s", "v")
    assert(Upsert.merge(base, updates, Seq("k")).count() == 2)
  }

  test("mergeLatest resolves in-batch conflicts to the highest version") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val updates = Seq(
      (1L, "v1", 11.0, 1L), (1L, "v2", 12.0, 2L), (3L, "new", 30.0, 1L))
      .toDF("k", "s", "v", "ver")
    val merged = Upsert.mergeLatest(base, updates, Seq("k"), "ver")
    assert(merged.columns.toSeq == Seq("k", "s", "v"), "ver must drop: base lacks it")
    val got = merged.orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "v2", 12.0), (2L, "b", 20.0), (3L, "new", 30.0)))
  }

  test("mergeLatest keeps the version column when base carries it") {
    val base = Seq((1L, 10.0, 0L)).toDF("k", "v", "ver")
    val updates = Seq((1L, 11.0, 5L), (1L, 12.0, 7L)).toDF("k", "v", "ver")
    val got = Upsert.mergeLatest(base, updates, Seq("k"), "ver")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 12.0, 7L)))
  }

  test("column order differences are reconciled by name") {
    val base = Seq((1L, 10.0, "a")).toDF("k", "v", "s")
    val updates = Seq((2L, "b", 20.0)).toDF("k", "s", "v")
    val merged = Upsert.merge(base, updates.select("k", "s", "v"), Seq("k"))
    assert(merged.count() == 2)
    assert(merged.filter(col("k") === 1L).select("s").head().getString(0) == "a")
  }
}
