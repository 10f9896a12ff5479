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

  /** Fact data files the plan will open (post bloom/manifest pruning) —
    * the VersionedTableIndexSpec contract measured via the plan's input
    * file set (scan metrics hide inside AQE query stages here because of
    * the broadcast semi-join). */
  private def factFilesScanned(df: org.apache.spark.sql.DataFrame, factP: String): Seq[String] =
    df.inputFiles.filter(_.contains(factP)).toSeq

  test("dim delta touching one key prunes the old-fact scan to matching files") {
    import spark.implicits._
    val (factP, dimP, viewP) = freshDirs()
    // four single-file fact commits, one dk per file, dk bloom sidecars
    (0 until 4).foreach { b =>
      val rows = (0 until 50).map(i => ((b * 50 + i).toLong, (b * 10).toLong, i.toDouble))
      VersionedTable.commitAppend(
        rows.toDF("k", "dk", "v").coalesce(1), factP, Seq("dk"), bloomCols = Seq("dk"))
    }
    VersionedTable.commitAppend(
      Seq((0L, "a"), (10L, "b"), (20L, "c"), (30L, "d")).toDF("d_id", "seg"), dimP)
    val sp = spec(factP, dimP)
    IncrementalJoinView.refresh(spark, sp, viewP, "c")

    val f0 = VersionedTable.versions(spark, factP).last
    VersionedTable.merge(spark, dimP, Seq((20L, "z")).toDF("d_id", "seg"), Seq("d_id"))
    val dvs = VersionedTable.versions(spark, dimP)
    val dD = VersionedTable.changesWithType(spark, dimP, dvs.init.last, dvs.last)

    val pruned = IncrementalJoinView.factForDimDelta(spark, sp, f0, dD)
    val all = VersionedTable.read(spark, factP, Some(f0)).inputFiles.length
    assert(all == 4, "fixture: four fact data files")
    assert(factFilesScanned(pruned, factP).size == 1,
      "a delta touching one dk must open one of the four fact files")
    assert(pruned.select("dk").distinct().collect().map(_.getLong(0)).toSeq == Seq(20L))

    // end-to-end: the refresh riding the pruned path still equals recompute
    assert(IncrementalJoinView.refresh(spark, sp, viewP, "c").isDefined)
    assert(viewState(viewP) == expected(factP, dimP))
    assert(viewState(viewP)("z") == (50L, 1225.0), "migrated group carries its 50 fact rows")
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
