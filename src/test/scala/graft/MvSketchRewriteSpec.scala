package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** DISTINCT-COUNT materialized view ([[graft.plans.MvRewrite]] sketch
  * partials): under the approx opt-in, `hll_sketch_agg(v)` and
  * `approx_count_distinct(v)` over the fact are served by unioning the
  * per-key state sketches, within sketch error of the exact distinct
  * count; without the opt-in both decline (union estimates can drift
  * from a directly-built sketch — approximation is a contract the user
  * signs, never a silent change). */
class MvSketchRewriteSpec extends SparkSuite {

  private val ConfKey = "spark.graft.mvrewrite.enabled"
  private val ApproxKey = "spark.graft.mvrewrite.approxdistinct.enabled"

  private def scanRoots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.toSet

  private def assertFired(df: DataFrame, fact: String, state: String): Unit = {
    val roots = scanRoots(df)
    assert(!roots.exists(_.endsWith(fact)), s"fact scan still present: $roots")
    assert(roots.exists(_.endsWith(state)), s"state scan missing: $roots")
  }

  private def assertDeclined(df: DataFrame, fact: String, label: String): Unit =
    assert(scanRoots(df).exists(_.endsWith(fact)),
      s"[$label] expected the fact scan to survive: ${scanRoots(df)}")

  /** ~3k rows, ~600 distinct values spread over 4 groups. */
  private def withFixture(test: (String, String) => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mvsk").toString
    val fact = tmp + "/fact"; val state = tmp + "/state"
    spark.range(3000)
      .selectExpr(
        "CAST(id % 4 AS STRING) AS k1",
        "CAST((id * 2654435761) % 600 AS LONG) AS v")
      .write.mode("overwrite").parquet(fact)
    MvRewrite.materializeWithSketch(spark, fact, Seq("k1"), "v", state)
    spark.conf.set(ConfKey, "true")
    try test(fact, state)
    finally {
      spark.conf.set(ConfKey, "false")
      spark.conf.set(ApproxKey, "false")
      MvRewrite.clear()
    }
  }

  private def exactDistinct(fact: String): Map[String, Long] =
    spark.read.parquet(fact).groupBy("k1")
      .agg(countDistinct(col("v")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hll_sketch_agg is served from unioned state sketches within sketch error") {
    withFixture { (fact, state) =>
      def q() = spark.read.parquet(fact)
        .groupBy("k1")
        .agg(
          hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("nd"),
          count(lit(1)).as("n"))
        .orderBy("k1")
      // approximation is opt-in: declined without the flag
      assertDeclined(q(), fact, "no-opt-in")
      spark.conf.set(ApproxKey, "true")
      assertFired(q(), fact, state)
      val exact = exactDistinct(fact)
      q().collect().foreach { r =>
        val (k, est) = (r.getString(0), r.getLong(1))
        assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
          s"k=$k est=$est exact=${exact(k)}")
      }
      // global (no-key) estimate: the union crosses groups
      def g() = spark.read.parquet(fact)
        .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("nd"))
      assertFired(g(), fact, state)
      val gEst = g().collect().head.getLong(0)
      assert(math.abs(gEst - 600).toDouble / 600 < 0.05, s"global est=$gEst")
    }
  }

  test("a different lgK than the state's declines (wrong-resolution sketch)") {
    withFixture { (fact, _) =>
      spark.conf.set(ApproxKey, "true")
      assertDeclined(
        spark.read.parquet(fact).groupBy("k1")
          .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(14))).as("nd")),
        fact, "lgK-mismatch")
    }
  }

  test("approx_count_distinct serves from the sketch under the opt-in, within error") {
    withFixture { (fact, state) =>
      def q() = spark.read.parquet(fact)
        .groupBy("k1")
        .agg(approx_count_distinct(col("v")).as("nd"))
        .orderBy("k1")
      assertDeclined(q(), fact, "no-opt-in")
      spark.conf.set(ApproxKey, "true")
      assertFired(q(), fact, state)
      val exact = exactDistinct(fact)
      q().collect().foreach { r =>
        val (k, est) = (r.getString(0), r.getLong(1))
        assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
          s"k=$k est=$est exact=${exact(k)}")
      }
    }
  }

  test("exact count(distinct) still declines even with both flags on") {
    withFixture { (fact, _) =>
      spark.conf.set(ApproxKey, "true")
      assertDeclined(
        spark.read.parquet(fact).groupBy("k1")
          .agg(countDistinct(col("v")).as("nd")),
        fact, "exact-distinct")
    }
  }

  test("sketch partial rides through a rollup (grouping-sets path)") {
    withFixture { (fact, state) =>
      spark.conf.set(ApproxKey, "true")
      def q() = spark.read.parquet(fact)
        .rollup("k1")
        .agg(
          hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("nd"),
          count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy("gid", "k1")
      assertFired(q(), fact, state)
      val exact = exactDistinct(fact)
      val rows = q().collect()
      rows.filter(_.getLong(3) == 0L).foreach { r =>
        val (k, est) = (r.getString(0), r.getLong(1))
        assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
          s"k=$k est=$est exact=${exact(k)}")
      }
      val total = rows.find(_.getLong(3) == 1L).get.getLong(1)
      assert(math.abs(total - 600).toDouble / 600 < 0.05, s"rolled-up est=$total")
    }
  }
}
