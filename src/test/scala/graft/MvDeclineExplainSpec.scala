package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.IncrementalView
import graft.plans.MvRewrite

/** Decline observability (`spark.graft.mvrewrite.explain=true`): a
  * declining rewrite must NAME its reason — logged and readable via
  * [[MvRewrite.recentDeclines]] — for the shapes a user actually hits:
  * a value-column filter and a version-pinned (time-travel) read. With
  * the flag off, nothing is recorded (the planning hot path stays
  * string-free). */
class MvDeclineExplainSpec extends SparkSuite {

  private val Enabled = "spark.graft.mvrewrite.enabled"
  private val Explain = "spark.graft.mvrewrite.explain"

  private def withFlags(test: => Unit): Unit = {
    spark.conf.set(Enabled, "true")
    spark.conf.set(Explain, "true")
    MvRewrite.clearDeclines()
    try test
    finally {
      spark.conf.set(Enabled, "false")
      spark.conf.set(Explain, "false")
      MvRewrite.clear()
      MvRewrite.clearDeclines()
    }
  }

  test("a value-column filter declines with a named reason") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mvdecl").toString
    val fact = tmp + "/fact"; val state = tmp + "/state"
    Seq(("a", 1L), ("a", 3L), ("b", 7L)).toDF("k", "v")
      .write.mode("overwrite").parquet(fact)
    MvRewrite.materialize(spark, fact, Seq("k"), "v", state)
    withFlags {
      val df = spark.read.parquet(fact)
        .filter(col("v") > 0L).groupBy("k").agg(sum("v").as("s"))
      df.collect() // plan it
      val reasons = MvRewrite.recentDeclines
      assert(reasons.exists(r => r.contains("non-key column") && r.contains("v")),
        s"expected a value-column-filter decline, got: $reasons")
    }
  }

  test("a version-pinned (time-travel) read declines with a named reason") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mvdecl_tt").toString
    val src = tmp + "/fact"; val view = tmp + "/view"
    VersionedTable.commitAppend(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), src)
    VersionedTable.commitAppend(Seq(("a", 10L)).toDF("k", "v"), src)
    IncrementalView.refreshRecompute(
      spark, src, view, "mv", Seq("k"), MvRewrite.stateAggs("v"))
    MvRewrite.registerRollup(spark, src, Seq("k"), "v", view)
    withFlags {
      val v1 = VersionedTable.versions(spark, src).head
      val pinned = VersionedTable.table(spark, src, Some(v1))
        .groupBy("k").agg(sum("v").as("s"))
      pinned.collect()
      val reasons = MvRewrite.recentDeclines
      assert(reasons.exists(_.contains("version-pinned/time-travel")),
        s"expected a time-travel decline, got: $reasons")
      // and the pinned read's RESULT is the old version, not the state
      assert(pinned.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("a", 1L), ("b", 2L)))
    }
  }

  test("with the explain flag off, declines record nothing") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mvdecl_off").toString
    val fact = tmp + "/fact"; val state = tmp + "/state"
    Seq(("a", 1L)).toDF("k", "v").write.mode("overwrite").parquet(fact)
    MvRewrite.materialize(spark, fact, Seq("k"), "v", state)
    spark.conf.set(Enabled, "true")
    MvRewrite.clearDeclines()
    try {
      spark.read.parquet(fact).filter(col("v") > 0L).groupBy("k").count().collect()
      assert(MvRewrite.recentDeclines.isEmpty)
    } finally {
      spark.conf.set(Enabled, "false")
      MvRewrite.clear()
    }
  }
}
