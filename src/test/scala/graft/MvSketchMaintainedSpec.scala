package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.IncrementalView
import graft.plans.MvRewrite

/** MAINTAINED distinct-count view: the sketch-bearing state lives in a
  * versioned table refreshed by [[IncrementalView.refreshRecompute]]
  * (sketches are not invertible, so the recompute flavor — touched
  * groups only — is the right maintenance path; refreshDelta could not
  * carry them), and `approx_count_distinct` over the CURRENT fact is
  * answered from it across merges and deletes. */
class MvSketchMaintainedSpec extends SparkSuite {

  private val ConfKey = "spark.graft.mvrewrite.enabled"
  private val ApproxKey = "spark.graft.mvrewrite.approxdistinct.enabled"

  private def factScanSurvives(df: DataFrame, factData: String): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.exists(_.contains(factData))

  test("sketch state refreshes with the fact; estimates track exact within 5%") {
    val tmp = java.nio.file.Files.createTempDirectory("mvskm").toString
    val fact = tmp + "/fact"; val view = tmp + "/view"
    val base = spark.range(4000)
      .selectExpr(
        "id AS pk",
        "CAST(id % 3 AS STRING) AS k1",
        "CAST((id * 2654435761) % 500 AS BIGINT) AS v")
    VersionedTable.commitAppend(base, fact, "pk")
    def refresh(): Unit = {
      IncrementalView.refreshRecompute(
        spark, fact, view, "mvskm", Seq("k1"),
        MvRewrite.stateAggsSketch("v"))
      ()
    }
    refresh()
    MvRewrite.registerRollup(spark, fact, Seq("k1"), "v", view)
    spark.conf.set(ConfKey, "true")
    spark.conf.set(ApproxKey, "true")
    try {
      def q() = VersionedTable.table(spark, fact)
        .groupBy("k1").agg(approx_count_distinct(col("v")).as("nd"))
        .orderBy("k1")
      def exact() = VersionedTable.table(spark, fact)
        .groupBy("k1").agg(countDistinct(col("v")).as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def checkServed(): Unit = {
        assert(!factScanSurvives(q(), s"$fact/data"), "fact scan not rewritten")
        val ex = exact()
        q().collect().foreach { r =>
          val (k, est) = (r.getString(0), r.getLong(1))
          assert(math.abs(est - ex(k)).toDouble / ex(k) < 0.05,
            s"k=$k est=$est exact=${ex(k)}")
        }
      }
      checkServed()
      // mutate: shift a slice of values into a new range, delete a slab
      VersionedTable.merge(spark, fact,
        base.filter(col("pk") % 7 === 0)
          .withColumn("v", col("v") + 10000L),
        Seq("pk"))
      VersionedTable.deleteWhere(spark, fact, col("pk") % 11 === 3)
      refresh()
      checkServed()
      // between mutation and refresh the rewrite serves the LAST
      // refreshed state — staleness is the registration contract (the
      // version gate guards time-travel pins, not freshness); the next
      // refresh trues it up
      VersionedTable.deleteWhere(spark, fact, col("pk") % 13 === 1)
      assert(!factScanSurvives(q(), s"$fact/data"),
        "current-version read should still rewrite (stale by contract)")
      refresh()
      checkServed()
    } finally {
      spark.conf.set(ConfKey, "false")
      spark.conf.set(ApproxKey, "false")
      MvRewrite.clear()
    }
  }
}
