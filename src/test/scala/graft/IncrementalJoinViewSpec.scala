package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.IncrementalJoinView
import graft.ops.IncrementalJoinView.Spec

/** Contract of [[IncrementalJoinView]]: the delta rule
  * Δ(F⋈D) = ΔF⋈D_new + F_old⋈ΔD applied through one merge equals a full
  * recompute after every combination of fact appends/deletes and dim
  * updates (including group-migrating attribute changes); replays no-op;
  * overwritten sources heal.
  */
class IncrementalJoinViewSpec extends SparkSuite {

  private def freshDirs(): (String, String, String) = {
    val p = java.nio.file.Files.createTempDirectory("ijv").toFile
    p.deleteOnExit()
    (p + "/fact", p + "/dim", p + "/view")
  }

  private def spec(fact: String, dim: String) =
    Spec(fact, dim, fk = "dk", dimKey = "d_id", groupCols = Seq("seg"), sumCols = Seq("v"))

  private def expected(fact: String, dim: String): Map[String, (Long, Double)] = {
    val f = VersionedTable.read(spark, fact)
    val d = VersionedTable.read(spark, dim)
    f.join(d, f("dk") === d("d_id"))
      .groupBy("seg").agg(count(lit(1)).as("cnt"), sum(col("v").cast("double")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  private def viewState(view: String): Map[String, (Long, Double)] =
    VersionedTable.read(spark, view)
      .collect()
      .map(r => r.getAs[String]("seg") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_v")))
      .toMap

  test("bootstrap, then fact append/delete + dim group-migrating update == recompute") {
    import spark.implicits._
    val (factP, dimP, viewP) = freshDirs()
    VersionedTable.commitAppend(
      Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 11.0)).toDF("k", "dk", "v"), factP)
    VersionedTable.commitAppend(
      Seq((10L, "red"), (20L, "blue")).toDF("d_id", "seg"), dimP)
    val sp = spec(factP, dimP)

    assert(IncrementalJoinView.refresh(spark, sp, viewP, "c").contains((1L, 1L)))
    assert(viewState(viewP) == Map("red" -> (2L, 12.0), "blue" -> (1L, 11.0)))

    // fact: append one row to dk=20, delete k=1 (red loses a row)
    VersionedTable.commitAppend(Seq((4L, 20L, 13.0)).toDF("k", "dk", "v"), factP)
    VersionedTable.deleteWhere(spark, factP, col("k") === 1L)
    // dim: migrate dk=10 from red to green (group migration via update)
    VersionedTable.merge(spark, dimP, Seq((10L, "green")).toDF("d_id", "seg"), Seq("d_id"))

    val applied = IncrementalJoinView.refresh(spark, sp, viewP, "c")
    assert(applied.isDefined)
    assert(viewState(viewP) == expected(factP, dimP))
    assert(viewState(viewP) == Map("green" -> (1L, 7.0), "blue" -> (2L, 24.0)))
    assert(!viewState(viewP).contains("red"), "migrated-away group must vanish")

    // replay: already current -> None, state unchanged
    assert(IncrementalJoinView.refresh(spark, sp, viewP, "c").isEmpty)
    assert(viewState(viewP) == expected(factP, dimP))
  }

  test("a group whose joined rows all disappear deletes from the view") {
    import spark.implicits._
    val (factP, dimP, viewP) = freshDirs()
    VersionedTable.commitAppend(
      Seq((1L, 10L, 5.0), (2L, 20L, 7.0)).toDF("k", "dk", "v"), factP)
    VersionedTable.commitAppend(
      Seq((10L, "red"), (20L, "blue")).toDF("d_id", "seg"), dimP)
    val sp = spec(factP, dimP)
    IncrementalJoinView.refresh(spark, sp, viewP, "c")
    VersionedTable.deleteWhere(spark, factP, col("dk") === 10L)
    IncrementalJoinView.refresh(spark, sp, viewP, "c")
    assert(viewState(viewP) == Map("blue" -> (1L, 7.0)))
  }

  test("an overwrite on a source heals via full resync instead of wedging") {
    import spark.implicits._
    val (factP, dimP, viewP) = freshDirs()
    VersionedTable.commitAppend(
      Seq((1L, 10L, 5.0), (2L, 10L, 7.0)).toDF("k", "dk", "v"), factP)
    VersionedTable.commitAppend(Seq((10L, "red")).toDF("d_id", "seg"), dimP)
    val sp = spec(factP, dimP)
    IncrementalJoinView.refresh(spark, sp, viewP, "c")
    VersionedTable.commitOverwrite(
      Seq((9L, 10L, 100.0)).toDF("k", "dk", "v"), factP)
    val applied = IncrementalJoinView.refresh(spark, sp, viewP, "c")
    assert(applied.isDefined)
    assert(viewState(viewP) == Map("red" -> (1L, 100.0)))
  }
}
