package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.IncrementalView

class IncrementalViewSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("ivm_spec").toString + "/tbl"

  private def rows(kv: (String, Double)*): DataFrame =
    kv.map { case (k, x) => (k, x) }.toDF("k", "x")

  /** Ground truth: direct aggregate of the source's current state. */
  private def direct(srcPath: String): Map[String, (Long, Double)] =
    VersionedTable.read(spark, srcPath)
      .groupBy("k").agg(count(lit(1)), sum($"x".cast("double")))
      .as[(String, Long, Double)].collect()
      .map { case (k, c, s) => k -> (c, s) }.toMap

  private def viewState(viewPath: String): Map[String, (Long, Double)] =
    VersionedTable.read(spark, viewPath)
      .select("k", "cnt", "sum_x")
      .as[(String, Long, Double)].collect()
      .map { case (k, c, s) => k -> (c, s) }.toMap

  test("delta refresh tracks append, merge, and delete windows without scanning the source") {
    val src = freshDir(); val view = freshDir()
    VersionedTable.commitAppend(rows("a" -> 1.0, "a" -> 2.0, "b" -> 10.0), src)
    // bootstrap = full compute
    assert(IncrementalView.refreshDelta(spark, src, view, "ivm", Seq("k"), Seq("x")).contains((0L, 1L)))
    assert(viewState(view) == direct(src))
    // already current -> None
    assert(IncrementalView.refreshDelta(spark, src, view, "ivm", Seq("k"), Seq("x")).isEmpty)
    // window of three commit kinds: append a new group, merge keyed by k
    // (replaces ALL of group a's rows with one — deletes + insert in the
    // feed), delete group b entirely
    VersionedTable.commitAppend(rows("c" -> 5.0, "a" -> 3.0), src)
    VersionedTable.merge(spark, src, Seq(("a", 100.0)).toDF("k", "x"), Seq("k"))
    val r = VersionedTable.deleteWhere(spark, src, $"k" === "b")
    assert(r._2 == 1L)
    IncrementalView.refreshDelta(spark, src, view, "ivm", Seq("k"), Seq("x"))
    assert(viewState(view) == direct(src))
    // group b vanished: its row is DELETED from the view, not a zero ghost
    assert(!viewState(view).contains("b"))
  }

  test("delta refresh handles a multi-row group update keyed by (k,x)") {
    val src = freshDir(); val view = freshDir()
    VersionedTable.commitAppend(rows("a" -> 1.0, "a" -> 2.0, "b" -> 7.0), src)
    IncrementalView.refreshDelta(spark, src, view, "ivm", Seq("k"), Seq("x"))
    // merge keyed by (k, x): reprice exactly the (a, 2.0) row to (a, 20.0)
    VersionedTable.merge(spark, src,
      Seq(("a", 2.0, false), ("a", 20.0, false)).toDF("k", "x", "_del")
        .filter($"x" === 2.0).withColumn("_del", lit(true))
        .unionByName(Seq(("a", 20.0, false)).toDF("k", "x", "_del")),
      Seq("k", "x"), deleteFlag = Some("_del"))
    IncrementalView.refreshDelta(spark, src, view, "ivm", Seq("k"), Seq("x"))
    assert(viewState(view) == direct(src))
    assert(viewState(view)("a") == ((2L, 21.0)))
  }

  test("recompute refresh gets non-invertible aggregates right when the max row dies") {
    val src = freshDir(); val view = freshDir()
    VersionedTable.commitAppend(rows("a" -> 5.0, "a" -> 9.0, "b" -> 3.0), src)
    val aggs = Seq(
      max($"x".cast("double")).as("max_x"),
      min($"x".cast("double")).as("min_x"))
    IncrementalView.refreshRecompute(spark, src, view, "ivm", Seq("k"), aggs)
    def v(): Map[String, (Double, Double)] =
      VersionedTable.read(spark, view).select("k", "max_x", "min_x")
        .as[(String, Double, Double)].collect()
        .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(v() == Map("a" -> ((9.0, 5.0)), "b" -> ((3.0, 3.0))))
    // delete the max row of group a: a decrementing view could never know
    // the new max; recompute re-reads only group a
    VersionedTable.deleteWhere(spark, src, $"k" === "a" && $"x" === 9.0)
    // and group b vanishes entirely
    VersionedTable.deleteWhere(spark, src, $"k" === "b")
    IncrementalView.refreshRecompute(spark, src, view, "ivm", Seq("k"), aggs)
    assert(v() == Map("a" -> ((5.0, 5.0))))
  }

  test("an overwrite window heals via full resync instead of wedging") {
    val src = freshDir(); val view = freshDir()
    VersionedTable.commitAppend(rows("a" -> 1.0), src)
    IncrementalView.refreshDelta(spark, src, view, "ivm", Seq("k"), Seq("x"))
    // overwrite = no row-level diff exists; refresh must fall back
    VersionedTable.commitOverwrite(rows("z" -> 42.0, "z" -> 8.0), src)
    assert(IncrementalView.refreshDelta(spark, src, view, "ivm", Seq("k"), Seq("x")).isDefined)
    assert(viewState(view) == direct(src))
    assert(viewState(view) == Map("z" -> ((2L, 50.0))))
  }

  test("mergeBatch is exactly-once: a replayed (writer, batch) is a no-op") {
    val path = freshDir()
    VersionedTable.commitAppend(rows("a" -> 1.0, "b" -> 2.0), path)
    val upd = Seq(("a", 10.0)).toDF("k", "x")
    val first = VersionedTable.mergeBatch(spark, path, upd, Seq("k"), "w1", 7L)
    assert(first.isDefined && first.get.matchedRows == 1L)
    val before = VersionedTable.read(spark, path).as[(String, Double)].collect().sorted.toSeq
    // crash-replay: same writer, same batch — nothing may change
    assert(VersionedTable.mergeBatch(spark, path, upd, Seq("k"), "w1", 7L).isEmpty)
    assert(VersionedTable.versions(spark, path).size == 2)
    assert(VersionedTable.read(spark, path).as[(String, Double)].collect().sorted.toSeq == before)
    // a LATER batch from the same writer applies
    assert(VersionedTable.mergeBatch(
      spark, path, Seq(("b", 20.0)).toDF("k", "x"), Seq("k"), "w1", 8L).isDefined)
    assert(VersionedTable.read(spark, path).as[(String, Double)].collect().toMap ==
      Map("a" -> 10.0, "b" -> 20.0))
  }
}
