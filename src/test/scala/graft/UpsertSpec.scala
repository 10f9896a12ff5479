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

  test("column order differences are reconciled by name") {
    val base = Seq((1L, 10.0, "a")).toDF("k", "v", "s")
    val updates = Seq((2L, "b", 20.0)).toDF("k", "s", "v")
    val merged = Upsert.merge(base, updates.select("k", "s", "v"), Seq("k"))
    assert(merged.count() == 2)
    assert(merged.filter(col("k") === 1L).select("s").head().getString(0) == "a")
  }
}
