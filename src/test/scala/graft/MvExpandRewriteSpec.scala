package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** GROUPING SETS / ROLLUP / CUBE materialized-view rewrite
  * ([[graft.plans.MvRewriteRule]]'s Aggregate-over-Expand path): every
  * grouping set of a rollup/cube over the fact must be answered from the
  * expanded STATE — identical results, fact scan gone — and the rewrite
  * must decline whenever a projection, filter, or aggregate touches the
  * fact through anything but group keys and the value column. */
class MvExpandRewriteSpec extends SparkSuite {

  private val ConfKey = "spark.graft.mvrewrite.enabled"

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

  private def assertOnEqualsOff(build: () => DataFrame): Unit = {
    val on = build().collect().toSeq
    spark.conf.set(ConfKey, "false")
    val off = try build().collect().toSeq finally spark.conf.set(ConfKey, "true")
    assert(on == off, s"on=$on off=$off")
  }

  private def withFixture(test: (String, String) => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mvexp").toString
    val fact = tmp + "/fact"; val state = tmp + "/state"
    import spark.implicits._
    Seq(
      ("a", "x", Some(1)), ("a", "x", Some(3)), ("a", "y", None),
      ("b", "x", Some(7)), ("b", "y", Some(9)), ("b", "y", Some(11)),
      (null.asInstanceOf[String], "y", Some(5)), ("c", null.asInstanceOf[String], Some(2)))
      .toDF("k1", "k2", "v")
      .write.mode("overwrite").parquet(fact)
    MvRewrite.materialize(spark, fact, Seq("k1", "k2"), "v", state)
    spark.conf.set(ConfKey, "true")
    try test(fact, state)
    finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("rollup over both keys: all aggregate shapes fire and match") {
    withFixture { (fact, state) =>
      def q() = spark.read.parquet(fact)
        .rollup("k1", "k2")
        .agg(
          count(lit(1)).as("n"), count(col("v")).as("nv"),
          sum("v").as("s"), min("v").as("mn"), max("v").as("mx"),
          avg("v").as("a"))
        .orderBy("k1", "k2")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
    }
  }

  test("cube and explicit grouping sets with grouping()/grouping_id() fire") {
    withFixture { (fact, state) =>
      def cube() = spark.read.parquet(fact)
        .cube("k1", "k2")
        .agg(sum("v").as("s"), count(lit(1)).as("n"),
          grouping_id().as("gid"), grouping("k1").as("g1"))
        .orderBy("gid", "k1", "k2")
      assertFired(cube(), fact, state)
      assertOnEqualsOff(cube _)
      spark.read.parquet(fact).createOrReplaceTempView("exp_fact")
      try {
        def gs() = spark.sql(
          """SELECT COALESCE(k1, 'ALL') AS k1a, COALESCE(k2, 'ALL') AS k2a,
            |       CAST(GROUPING(k1) AS INT) AS g1, count(*) AS n, sum(v) AS s
            |FROM exp_fact
            |GROUP BY GROUPING SETS ((k1, k2), (k1), ())
            |ORDER BY g1, k1a, k2a""".stripMargin)
        assertFired(gs(), fact, state)
        assertOnEqualsOff(gs _)
      } finally spark.catalog.dropTempView("exp_fact")
    }
  }

  test("null fact keys stay distinct from rolled-up nulls (gid separates them)") {
    withFixture { (fact, state) =>
      // fixture has a REAL null k1 and a real null k2: the (k1) subtotal
      // row for k1=null must not merge with the grand total
      def q() = spark.read.parquet(fact)
        .rollup("k1")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), grouping_id().as("gid"))
        .orderBy("gid", "k1")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
      val rows = q().collect()
      // real-null k1 detail row (gid=0) and grand total (gid=1) coexist
      assert(rows.count(r => r.isNullAt(0)) == 2, rows.mkString(","))
    }
  }

  test("group-key filter below the rollup translates onto the state") {
    withFixture { (fact, state) =>
      def q() = spark.read.parquet(fact)
        .filter(col("k2") === "y")
        .rollup("k1")
        .agg(count(col("v")).as("nv"), sum("v").as("s"))
        .orderBy("k1")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
    }
  }

  test("declines: value filter, non-key grouping set, distinct, value in grouping") {
    withFixture { (fact, _) =>
      assertDeclined(spark.read.parquet(fact)
        .filter(col("v") > 2).rollup("k1").agg(sum("v").as("s")),
        fact, "value-filter")
      assertDeclined(spark.read.parquet(fact)
        .rollup("k1", "v").agg(count(lit(1)).as("n")),
        fact, "value-in-grouping")
      assertDeclined(spark.read.parquet(fact)
        .rollup("k1").agg(countDistinct("v").as("nd")),
        fact, "distinct")
      assertDeclined(spark.read.parquet(fact)
        .rollup("k1").agg(sum(col("v") * 2).as("s")),
        fact, "sum(v*2)")
    }
  }

  test("rollup over a STAR join (fact ⋈ dim) rewrites to rollup over state ⋈ dim") {
    withFixture { (fact, state) =>
      import spark.implicits._
      // SQL text: the Dataset rollup-after-join API trips Spark's
      // DetectAmbiguousSelfJoin dataset-id check even WITHOUT this rule
      Seq(("a", "east"), ("b", "west"), ("b", "north"), ("d", "south"))
        .toDF("k1", "region").createOrReplaceTempView("exp_dim")
      spark.read.parquet(fact).createOrReplaceTempView("exp_fact2")
      try {
        def q() = spark.sql(
          """SELECT region, k2, count(*) AS n, sum(v) AS s, avg(v) AS a,
            |       grouping_id() AS gid
            |FROM exp_fact2 f JOIN exp_dim d ON f.k1 = d.k1
            |GROUP BY ROLLUP (region, k2)
            |ORDER BY gid, region, k2""".stripMargin)
        assertFired(q(), fact, state)
        assertOnEqualsOff(q _)
        // non-key fact column anywhere in the star rollup still declines
        assertDeclined(spark.sql(
          """SELECT region, v, count(*) AS n
            |FROM exp_fact2 f JOIN exp_dim d ON f.k1 = d.k1
            |GROUP BY ROLLUP (region, v)""".stripMargin),
          fact, "value-in-star-grouping")
        assertDeclined(spark.sql(
          """SELECT region, count(*) AS n
            |FROM exp_fact2 f JOIN exp_dim d ON f.k1 = d.k1
            |WHERE v > 2 GROUP BY ROLLUP (region)""".stripMargin),
          fact, "value-filter-in-star-rollup")
      } finally Seq("exp_dim", "exp_fact2").foreach(spark.catalog.dropTempView)
    }
  }

  test("delta-state (no min/max) serves count/sum rollups, declines min/max") {
    withFixture { (fact, state) =>
      // register a SECOND view whose state lacks min_v/max_v by
      // projecting them away — mimics registerDeltaRollup's contract
      val narrow = state + "_narrow"
      spark.read.parquet(state).drop("min_v", "max_v")
        .write.mode("overwrite").parquet(narrow)
      MvRewrite.clear()
      val rel = spark.read.parquet(narrow).queryExecution.analyzed
      MvRewrite.register(MvRewrite.MvDef(
        scanRoots(spark.read.parquet(fact)), Seq("k1", "k2"), "v", narrow,
        () => rel match {
          case p => p.transformUp { case x => x } // fresh copy not needed: single use per test
        }))
      def sums() = spark.read.parquet(fact).rollup("k1")
        .agg(count(lit(1)).as("n"), sum("v").as("s")).orderBy("k1")
      assertFired(sums(), fact, narrow)
      assertOnEqualsOff(sums _)
      assertDeclined(spark.read.parquet(fact).rollup("k1")
        .agg(min("v").as("mn")), fact, "min-on-narrow-state")
    }
  }
}
