package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.IncrementalView
import graft.plans.MvRewrite

/** End-to-end MAINTAINED materialized view (VERDICT r9 item 2): the fact
  * is a [[VersionedTable]], its rollup state another VersionedTable kept
  * current by [[IncrementalView.refreshRecompute]] over the CDF (touched
  * groups only — refresh cost ∝ change volume), registered through
  * [[MvRewrite.registerRollup]] so a user's PLAIN aggregate over
  * [[VersionedTable.table]] is answered from the state — and stays
  * correct across append, merge, and delete, because the state provider
  * re-resolves the CURRENT view version at plan time. */
@org.scalatest.tags.Slow
class MvMaintainedSpec extends SparkSuite {

  private val ConfKey = "spark.graft.mvrewrite.enabled"

  private def scanRoots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.toSet

  test("refreshDelta-style maintenance loop: rewrite answer tracks the fact") {
    val tmp = java.nio.file.Files.createTempDirectory("mv_maint").toString
    val src = tmp + "/fact"; val view = tmp + "/view"
    import spark.implicits._

    // v = id * mult, null on every 7th row (exercises n_vals vs n_rows)
    def fact(ids: Range, mult: Long): DataFrame =
      ids.map(_.toLong).toDF("id")
        .select(col("id"),
          concat(lit("k"), (col("id") % 5).cast("string")).as("k"),
          when(col("id") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("id") * mult).as("v"))

    VersionedTable.commitAppend(fact(0 until 200, 1), src)
    IncrementalView.refreshRecompute(
      spark, src, view, "mv", Seq("k"), MvRewrite.stateAggs("v"))
    MvRewrite.registerRollup(spark, src, Seq("k"), "v", view)
    spark.conf.set(ConfKey, "true")
    try {
      def q() = VersionedTable.table(spark, src)
        .groupBy("k")
        .agg(
          count(lit(1)).as("n"), count(col("v")).as("nv"),
          sum("v").as("s"), min("v").as("mn"), max("v").as("mx"),
          avg("v").as("a"))
        .orderBy("k")

      def direct() = {
        spark.conf.set(ConfKey, "false")
        try q().collect().toSeq finally spark.conf.set(ConfKey, "true")
      }

      def assertFiredAndCorrect(): Unit = {
        val roots = scanRoots(q())
        assert(!roots.contains(s"$src/data"), s"fact scan survived: $roots")
        assert(roots.exists(_.contains("/view/")), s"state scan missing: $roots")
        assert(q().collect().toSeq == direct())
      }

      assertFiredAndCorrect()

      // append new rows (new group k-member counts change)
      VersionedTable.commitAppend(fact(200 until 260, 3), src)
      IncrementalView.refreshRecompute(
        spark, src, view, "mv", Seq("k"), MvRewrite.stateAggs("v"))
      assertFiredAndCorrect()

      // merge: reprice every 10th id (touched groups recompute exactly)
      VersionedTable.merge(spark, src,
        fact(0 until 200, 1)
          .filter(col("id") % 10 === 0)
          .withColumn("v", col("v") * 100),
        Seq("id"))
      IncrementalView.refreshRecompute(
        spark, src, view, "mv", Seq("k"), MvRewrite.stateAggs("v"))
      assertFiredAndCorrect()

      // delete: min/max are not invertible — the recompute path must heal
      VersionedTable.deleteWhere(spark, src, col("id") % 3 === 1)
      IncrementalView.refreshRecompute(
        spark, src, view, "mv", Seq("k"), MvRewrite.stateAggs("v"))
      assertFiredAndCorrect()

      // STALENESS is the registration contract: mutate WITHOUT refresh and
      // the rewrite serves the old state; one refresh re-converges
      VersionedTable.deleteWhere(spark, src, col("id") % 3 === 2)
      assert(q().collect().toSeq != direct(), "expected a stale read before refresh")
      IncrementalView.refreshRecompute(
        spark, src, view, "mv", Seq("k"), MvRewrite.stateAggs("v"))
      assertFiredAndCorrect()

      // TIME TRAVEL must DECLINE: a version-pinned read scans an older
      // file list than the state tracks — answering it from the current
      // state would silently return current-version numbers
      def pinned() = VersionedTable.table(spark, src, Some(1L))
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s")).orderBy("k")
      assert(scanRoots(pinned()).contains(s"$src/data"),
        "time-travel read must not be rewritten")
      // and its answer is the VERSION-1 aggregate, not the current one
      assert(pinned().collect().toSeq != q().collect().toSeq)
      spark.conf.set(ConfKey, "false")
      val pinnedDirect = try pinned().collect().toSeq
        finally spark.conf.set(ConfKey, "true")
      assert(pinned().collect().toSeq == pinnedDirect)
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("delta-maintained rollup: CDF-only refresh, partial-state declines, replay no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("mv_delta").toString
    val src = tmp + "/fact"; val view = tmp + "/view"
    import spark.implicits._

    // integer-valued doubles: refreshDelta sums as double, values exact
    def fact(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(_.toLong).toDF("id")
        .select(col("id"),
          concat(lit("k"), (col("id") % 4).cast("string")).as("k"),
          (col("id") * 2.0).as("v"))

    VersionedTable.commitAppend(fact(0 until 120), src)
    IncrementalView.refreshDelta(spark, src, view, "mvd", Seq("k"), Seq("v"))
    MvRewrite.registerDeltaRollup(spark, src, Seq("k"), "v", view)
    spark.conf.set(ConfKey, "true")
    try {
      def covered() = VersionedTable.table(spark, src)
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a"))
        .orderBy("k")
      def direct[A](q: () => org.apache.spark.sql.DataFrame) = {
        spark.conf.set(ConfKey, "false")
        try q().collect().toSeq finally spark.conf.set(ConfKey, "true")
      }
      def assertCovered(): Unit = {
        val roots = scanRoots(covered())
        assert(!roots.contains(s"$src/data"), s"fact scan survived: $roots")
        assert(covered().collect().toSeq == direct(covered _))
      }
      assertCovered()

      // min needs min_v, which the delta state lacks: decline, stay right
      def minQ() = VersionedTable.table(spark, src)
        .groupBy("k").agg(min("v").as("mn")).orderBy("k")
      assert(scanRoots(minQ()).contains(s"$src/data"), "expected decline on min")
      assert(minQ().collect().toSeq == direct(minQ _))

      // merge + delete, ONE delta refresh from the CDF window
      VersionedTable.merge(spark, src,
        fact(0 until 120).filter(col("id") % 6 === 0).withColumn("v", col("v") * 10),
        Seq("id"))
      VersionedTable.deleteWhere(spark, src, col("id") % 5 === 2)
      IncrementalView.refreshDelta(spark, src, view, "mvd", Seq("k"), Seq("v"))
      assertCovered()

      // replayed refresh (same consumer, current version) is a no-op
      assert(IncrementalView.refreshDelta(
        spark, src, view, "mvd", Seq("k"), Seq("v")).isEmpty)
      assertCovered()

      // a registry entry whose state table lacks even n_rows declines
      // instead of crashing the optimizer
      MvRewrite.register(MvRewrite.MvDef(
        Set(s"$src/data"), Seq("k"), "v", "broken",
        () => VersionedTable.read(spark, view)
          .select(col("k")).queryExecution.analyzed))
      assert(minQ().collect().toSeq == direct(minQ _)) // still answers
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("SQL over the DSv2 catalog table rewrites; VERSION AS OF declines") {
    val tmp = java.nio.file.Files.createTempDirectory("mv_cat").toString
    val src = tmp + "/fact"; val view = tmp + "/view"
    import spark.implicits._
    VersionedTable.commitAppend(
      (0L until 90L).map(i => (i, s"k${i % 3}", i * 2)).toDF("id", "k", "v"), src)
    IncrementalView.refreshRecompute(
      spark, src, view, "mvc", Seq("k"), MvRewrite.stateAggs("v"))
    MvRewrite.registerRollup(spark, src, Seq("k"), "v", view)
    spark.conf.set("spark.sql.catalog.mvcat", classOf[graft.sources.VtCatalog].getName)
    spark.conf.set(ConfKey, "true")
    try {
      def q() = spark.sql(
        s"SELECT k, count(*) AS n, sum(v) AS s, avg(v) AS a FROM mvcat.`$src` GROUP BY k ORDER BY k")
      // fires: the only file scan left is the STATE's (the fact's DSv2
      // relation is gone; the state resolves to view-path parquet files)
      val roots = scanRoots(q())
      assert(roots.nonEmpty && roots.forall(_.contains("/view")), roots)
      assert(q().queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
      }.isEmpty, "fact DSv2 scan survived")
      val viaSql = q().collect().toSeq
      spark.conf.set(ConfKey, "false")
      val direct = try q().collect().toSeq finally spark.conf.set(ConfKey, "true")
      assert(viaSql == direct)

      // mutate + refresh: the catalog query tracks the view
      VersionedTable.deleteWhere(spark, src, col("id") % 9 === 0)
      IncrementalView.refreshRecompute(
        spark, src, view, "mvc", Seq("k"), MvRewrite.stateAggs("v"))
      assert(q().collect().toSeq.map(_.getLong(1)).sum == 80L)

      // time travel through the catalog must DECLINE (served by the scan)
      def pinned() = spark.sql(
        s"SELECT k, count(*) AS n FROM mvcat.`$src` VERSION AS OF 1 GROUP BY k ORDER BY k")
      assert(pinned().collect().map(_.getLong(1)).sum == 90L)
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("STREAMING appends through the exactly-once sink feed the maintained view") {
    val tmp = java.nio.file.Files.createTempDirectory("mv_stream").toString
    val src = tmp + "/fact"; val view = tmp + "/view"; val ckpt = tmp + "/ckpt"
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val stream = mem.toDF().select(
      col("value").as("id"),
      concat(lit("k"), (col("value") % 3).cast("string")).as("k"),
      (col("value") * 2.0).as("v"))
    val q = graft.streaming.EventStreams.startExactlyOnceVersionedSink(
      stream, src, "ingest", ckpt)
    try {
      mem.addData(0L until 50L: _*)
      q.processAllAvailable()
      IncrementalView.refreshDelta(spark, src, view, "mvs", Seq("k"), Seq("v"))
      MvRewrite.registerDeltaRollup(spark, src, Seq("k"), "v", view)
      spark.conf.set(ConfKey, "true")

      def agg() = VersionedTable.table(spark, src)
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a"))
        .orderBy("k")
      def direct() = {
        spark.conf.set(ConfKey, "false")
        try agg().collect().toSeq finally spark.conf.set(ConfKey, "true")
      }
      assert(!scanRoots(agg()).contains(s"$src/data"), "rewrite must fire")
      assert(agg().collect().toSeq == direct())

      // more micro-batches land through the sink; ONE delta refresh
      // (CDF window only — zero fact scans) re-converges the view
      mem.addData(50L until 80L: _*)
      q.processAllAvailable()
      IncrementalView.refreshDelta(spark, src, view, "mvs", Seq("k"), Seq("v"))
      assert(agg().collect().toSeq == direct())
      assert(agg().collect().map(_.getLong(1)).sum == 80L) // n across groups
    } finally {
      q.stop()
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }
}
