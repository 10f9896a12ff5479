package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** Materialized-view auto-rewrite ([[graft.plans.MvRewrite]] +
  * [[graft.plans.MvRewriteRule]], injected by [[GraftExtensions]]):
  * the rewrite must FIRE (fact scan gone from the optimized plan) for
  * every covered aggregate shape, produce results identical to the
  * direct fact aggregate, and DECLINE — never rewrite wrong — for every
  * out-of-scope shape. */
class MvRewriteSpec extends SparkSuite {

  private val ConfKey = "spark.graft.mvrewrite.enabled"

  /** Root paths of every file relation in the optimized plan. */
  private def scanRoots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.toSet

  private def assertFired(df: DataFrame, factPath: String, statePath: String): Unit = {
    val roots = scanRoots(df)
    assert(!roots.exists(_.endsWith(factPath.stripPrefix("file:"))),
      s"fact scan still present: $roots")
    assert(roots.exists(_.endsWith(statePath.stripPrefix("file:"))),
      s"state scan missing: $roots")
  }

  private def assertDeclined(df: DataFrame, factPath: String, label: String = ""): Unit =
    assert(scanRoots(df).exists(_.endsWith(factPath.stripPrefix("file:"))),
      s"[$label] expected the fact scan to survive: ${scanRoots(df)}")

  /** Tiny fact with a null value, a null group key, and a skewed key. */
  private def withFixture(test: (String, String) => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mvrw").toString
    val fact = tmp + "/fact"; val state = tmp + "/state"
    import spark.implicits._
    Seq(
      ("a", "x", Some(1)), ("a", "x", Some(3)), ("a", "y", None),
      ("b", "x", Some(7)), ("b", "y", Some(9)), ("b", "y", Some(11)),
      (null, "y", Some(5)), ("c", null, Some(2)))
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

  /** Same query with the rule on and off must agree exactly. */
  private def assertOnEqualsOff(build: () => DataFrame): Unit = {
    val on = build().collect().toSeq
    spark.conf.set(ConfKey, "false")
    val off = try build().collect().toSeq finally spark.conf.set(ConfKey, "true")
    assert(on == off, s"on=$on off=$off")
  }

  test("fires for all five aggregate shapes and matches the direct answer") {
    withFixture { (fact, state) =>
      def q() = spark.read.parquet(fact)
        .groupBy("k1")
        .agg(
          count(lit(1)).as("n"), count(col("v")).as("nv"),
          sum("v").as("s"), min("v").as("mn"), max("v").as("mx"),
          avg("v").as("a"))
        .orderBy("k1")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
    }
  }

  test("subset-of-keys regroup and global (no-key) aggregate fire") {
    withFixture { (fact, state) =>
      def byK1() = spark.read.parquet(fact).groupBy("k1")
        .agg(sum("v").as("s"), avg("v").as("a")).orderBy("k1")
      def global() = spark.read.parquet(fact)
        .agg(count(lit(1)).as("n"), sum("v").as("s"), min("v").as("mn"))
      assertFired(byK1(), fact, state)
      assertFired(global(), fact, state)
      assertOnEqualsOff(byK1 _)
      assertOnEqualsOff(global _)
    }
  }

  test("group-key filter translates onto the state; null keys group identically") {
    withFixture { (fact, state) =>
      def q() = spark.read.parquet(fact)
        .filter(col("k2") === "y")
        .groupBy("k1")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .orderBy("k1")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
      // the translated filter must reach the STATE parquet scan as an
      // ordinary pushed predicate — the rewrite hands off to standard
      // pushdown, it does not strand the filter above the aggregate
      val physical = q().queryExecution.executedPlan.toString
      assert(physical.contains("PushedFilters") &&
        physical.replaceAll("\\s", "").contains("EqualTo(k2,y)"), physical)
      // null group keys: k1 has a null — both sides keep it as its own group
      def nullGroups() = spark.read.parquet(fact).groupBy("k1", "k2")
        .agg(count(col("v")).as("nv")).orderBy("k1", "k2")
      assertFired(nullGroups(), fact, state)
      assertOnEqualsOff(nullGroups _)
    }
  }

  test("count-vs-countNonNull-vs-avg null semantics survive the rewrite") {
    withFixture { (fact, state) =>
      def q() = spark.read.parquet(fact).groupBy("k1")
        .agg(count(lit(1)).as("n"), count(col("v")).as("nv"), avg("v").as("a"))
        .orderBy("k1")
      assertFired(q(), fact, state)
      val rows = q().collect()
      val a = rows.find(r => r.getString(0) == "a").get
      // group a: 3 rows, one null v -> count(*)=3, count(v)=2, avg=(1+3)/2
      assert(a.getLong(1) == 3L && a.getLong(2) == 2L && a.getDouble(3) == 2.0)
    }
  }

  test("SQL text path fires too (rule sees the analyzed SQL plan)") {
    withFixture { (fact, state) =>
      spark.read.parquet(fact).createOrReplaceTempView("mv_fact")
      try {
        def q() = spark.sql(
          "SELECT k1, count(*) AS n, sum(v) AS s FROM mv_fact GROUP BY k1 ORDER BY k1")
        assertFired(q(), fact, state)
        assertOnEqualsOff(q _)
      } finally spark.catalog.dropTempView("mv_fact")
    }
  }

  test("declines: value-column filter, non-value aggregate, distinct, count(null)") {
    withFixture { (fact, _) =>
      assertDeclined(spark.read.parquet(fact)
        .filter(col("v") > 2).groupBy("k1").agg(sum("v").as("s")), fact, "value-filter")
      assertDeclined(spark.read.parquet(fact)
        .groupBy("k1").agg(sum(col("v") * 2).as("s")), fact, "sum(v*2)")
      assertDeclined(spark.read.parquet(fact)
        .groupBy("k1").agg(countDistinct(col("v")).as("nd")), fact, "distinct")
      assertDeclined(spark.read.parquet(fact)
        .groupBy("k1").agg(max("k2").as("mk")), fact, "max(k2)")
      // count(NULL) is 0, not count(*): NullPropagation folds it to a
      // 0-literal before this rule runs (the rewrite may then fire
      // vacuously — sound, a global aggregate is one row either way),
      // but the VALUE must stay 0; rewriteAgg's !c.nullable guard keeps
      // it 0 even when this rule wins the fixed-point race with the fold
      val cn = spark.sql("SELECT count(CAST(NULL AS INT)) AS n FROM parquet.`" + fact + "`")
      assert(cn.collect().head.getLong(0) == 0L)
    }
  }

  test("declines: non-key join under the aggregate and grouping sets") {
    withFixture { (fact, _) =>
      // a join on the VALUE column is not served by the star path —
      // key-only joins now rewrite (MvStarRewriteSpec covers those)
      val dimV = spark.range(3).selectExpr("CAST(id AS INT) AS v")
      assertDeclined(
        spark.read.parquet(fact).join(dimV, "v").groupBy("k1").agg(count(lit(1)).as("n")),
        fact, "join-on-value")
      // rollup over the keys alone now FIRES (MvExpandRewriteSpec); a
      // rollup grouping by the VALUE column must still decline
      assertDeclined(
        spark.read.parquet(fact).rollup("k1", "v").agg(count(lit(1)).as("n")),
        fact, "rollup-on-value")
    }
  }

  test("declines decimal sum/avg (re-aggregation widens the type)") {
    val tmp = java.nio.file.Files.createTempDirectory("mvrw_dec").toString
    val fact = tmp + "/fact"; val state = tmp + "/state"
    spark.range(10)
      .selectExpr("CAST(id % 2 AS STRING) AS k1", "CAST(id AS DECIMAL(10,2)) AS v")
      .write.mode("overwrite").parquet(fact)
    MvRewrite.materialize(spark, fact, Seq("k1"), "v", state)
    spark.conf.set(ConfKey, "true")
    try {
      def q() = spark.read.parquet(fact).groupBy("k1")
        .agg(sum("v").as("s"), avg("v").as("a")).orderBy("k1")
      assertDeclined(q(), fact)
      assertOnEqualsOff(q _)
      // min/max/count keep their types, so a query of ONLY those still fires
      assertFired(spark.read.parquet(fact).groupBy("k1")
        .agg(min("v").as("mn"), max("v").as("mx"), count(lit(1)).as("n")),
        fact, state)
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("multiple views over one fact: non-covering candidates never block, smallest wins") {
    withFixture { (fact, state) =>
      // a second, SMALLER view (keys = k1 only) over the same fact: it
      // cannot serve k1+k2 groupings but must serve k1-only ones, and
      // being smaller it must WIN for those over the (k1,k2) view
      val tmp2 = java.nio.file.Files.createTempDirectory("mvrw_small").toString + "/state1"
      MvRewrite.materialize(spark, fact, Seq("k1"), "v", tmp2)
      def byBoth() = spark.read.parquet(fact).groupBy("k1", "k2")
        .agg(sum("v").as("s")).orderBy("k1", "k2")
      def byK1() = spark.read.parquet(fact).groupBy("k1")
        .agg(sum("v").as("s")).orderBy("k1")
      // (k1,k2) grouping: only the wide view covers - the narrow one
      // must not block it
      assertFired(byBoth(), fact, state)
      assertOnEqualsOff(byBoth _)
      // k1 grouping: both cover; the narrow (fewest-keys) view wins
      assertFired(byK1(), fact, tmp2)
      assert(!scanRoots(byK1()).exists(_.endsWith(state.stripPrefix("file:"))),
        s"expected the smaller view to win: ${scanRoots(byK1())}")
      assertOnEqualsOff(byK1 _)
    }
  }

  test("conf off means no rewrite even when a view is registered") {
    withFixture { (fact, _) =>
      spark.conf.set(ConfKey, "false")
      assertDeclined(
        spark.read.parquet(fact).groupBy("k1").agg(sum("v").as("s")), fact)
      spark.conf.set(ConfKey, "true")
    }
  }

  test("downstream operators keep working on the rewritten output (ExprIds stable)") {
    withFixture { (fact, state) =>
      def q() = spark.read.parquet(fact)
        .groupBy("k1").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .filter(col("s") > 3)
        .withColumn("per", col("s").cast("double") / col("n"))
        .orderBy(desc("per"))
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
    }
  }
}
