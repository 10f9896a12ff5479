package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** STAR materialized-view rewrite ([[graft.plans.MvRewriteRule]]'s join
  * path): an aggregate over the fact JOINED to dimensions must be
  * answered from (state ⋈ the same dims) when the join/filters/grouping
  * touch only view group keys on the fact side — and must DECLINE, never
  * rewrite wrong, whenever the fact participates through a non-key
  * column, a duplicate-sensitive dim aggregate, or a join type that
  * preserves unmatched dim rows. */
class MvStarRewriteSpec extends SparkSuite {

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

  /** Fact keyed by (k1, k2) with a null value and a null key; dim1 maps
    * k1 → region (with one key, "b", DUPLICATED — multiplicity must
    * multiply partials and fact rows alike); dim2 maps region → zone;
    * neither dim covers every fact key (so outer-join semantics bite). */
  private def withStar(test: (String, String, DataFrame, DataFrame) => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mvstar").toString
    val fact = tmp + "/fact"; val state = tmp + "/state"
    import spark.implicits._
    Seq(
      ("a", "x", Some(1)), ("a", "x", Some(3)), ("a", "y", None),
      ("b", "x", Some(7)), ("b", "y", Some(9)), ("b", "y", Some(11)),
      (null.asInstanceOf[String], "y", Some(5)), ("c", null.asInstanceOf[String], Some(2)))
      .toDF("k1", "k2", "v")
      .write.mode("overwrite").parquet(fact)
    val dim1 = Seq(("a", "east"), ("b", "west"), ("b", "north"), ("d", "south"))
      .toDF("k1", "region")
    val dim2 = Seq(("east", "z1"), ("west", "z2"), ("north", "z2"))
      .toDF("region", "zone")
    MvRewrite.materialize(spark, fact, Seq("k1", "k2"), "v", state)
    spark.conf.set(ConfKey, "true")
    try test(fact, state, dim1, dim2)
    finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("inner join to a dim, grouped by the dim attribute: fires and matches") {
    withStar { (fact, state, dim1, _) =>
      def q() = spark.read.parquet(fact)
        .join(dim1, Seq("k1"))
        .groupBy("region")
        .agg(
          count(lit(1)).as("n"), count(col("v")).as("nv"),
          sum("v").as("s"), min("v").as("mn"), max("v").as("mx"),
          avg("v").as("a"))
        .orderBy("region")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
      // duplicated dim key "b": multiplicity 2 must double b's partials
      // exactly as it doubles b's fact rows — count for west+north both
      // include all three b-rows
      val rows = q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("west") == 3L && rows("north") == 3L, rows.toString)
    }
  }

  test("two-dim snowflake chain grouped by the far dim: fires and matches") {
    withStar { (fact, state, dim1, dim2) =>
      def q() = spark.read.parquet(fact)
        .join(dim1, Seq("k1"))
        .join(dim2, Seq("region"))
        .groupBy("zone")
        .agg(sum("v").as("s"), count(lit(1)).as("n"), avg("v").as("a"))
        .orderBy("zone")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
    }
  }

  test("mixed grouping (dim attr + fact key), dim-side filter, explicit join cond") {
    withStar { (fact, state, dim1, _) =>
      val f = spark.read.parquet(fact)
      def q() = f
        .join(dim1, f("k1") === dim1("k1"))
        .filter(col("region") =!= "south")
        .groupBy(dim1("region"), f("k2"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .orderBy("region", "k2")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
    }
  }

  test("fact-key filter below the join translates onto the state") {
    withStar { (fact, state, dim1, _) =>
      def q() = spark.read.parquet(fact)
        .filter(col("k2") === "y")
        .join(dim1, Seq("k1"))
        .groupBy("region")
        .agg(count(col("v")).as("nv"), sum("v").as("s"))
        .orderBy("region")
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
    }
  }

  test("pure-dim min/max ride along; duplicate-sensitive dim aggregates decline") {
    withStar { (fact, state, dim1, _) =>
      def minMax() = spark.read.parquet(fact)
        .join(dim1, Seq("k1"))
        .groupBy("k2")
        .agg(sum("v").as("s"), min("region").as("mr"), max("region").as("xr"))
        .orderBy("k2")
      assertFired(minMax(), fact, state)
      assertOnEqualsOff(minMax _)
      // count(region)/first(region) see each dim row n_rows times in the
      // original but once via the state — must decline
      assertDeclined(spark.read.parquet(fact).join(dim1, Seq("k1"))
        .groupBy("k2").agg(count(col("region")).as("cr")), fact, "count(dim)")
      assertDeclined(spark.read.parquet(fact).join(dim1, Seq("k1"))
        .groupBy("k2").agg(first(col("region")).as("fr")), fact, "first(dim)")
    }
  }

  test("declines: non-key fact column in join cond, filter, or grouping") {
    withStar { (fact, _, dim1, _) =>
      val f = spark.read.parquet(fact)
      import spark.implicits._
      val dimV = Seq(1, 7).toDF("vv")
      assertDeclined(
        f.join(dimV, f("v") === dimV("vv")).groupBy("k1").agg(count(lit(1)).as("n")),
        fact, "join-on-value")
      assertDeclined(
        f.join(dim1, Seq("k1")).filter(f("v") > 2)
          .groupBy("region").agg(count(lit(1)).as("n")),
        fact, "value-filter-above-join")
      assertDeclined(
        f.filter(f("v") > 2).join(dim1, Seq("k1"))
          .groupBy("region").agg(count(lit(1)).as("n")),
        fact, "value-filter-below-join")
      assertDeclined(
        f.join(dim1, Seq("k1")).groupBy("v").agg(count(lit(1)).as("n")),
        fact, "group-by-value")
    }
  }

  test("outer joins: preserved-fact side fires, preserved-dim side declines") {
    withStar { (fact, state, dim1, _) =>
      def leftPreserved() = spark.read.parquet(fact)
        .join(dim1, Seq("k1"), "left_outer")
        .groupBy("region")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .orderBy("region")
      // fact keys c/null have no dim match → NULL region group must
      // carry their n_rows through Σ n_rows
      assertFired(leftPreserved(), fact, state)
      assertOnEqualsOff(leftPreserved _)
      // dim preserved: unmatched dim row "d"/south appears ONCE with
      // NULL fact columns; count(*) counts it but Σ n_rows cannot
      assertDeclined(
        dim1.join(spark.read.parquet(fact), Seq("k1"), "left_outer")
          .groupBy("region").agg(count(lit(1)).as("n")),
        fact, "dim-preserved-left")
      assertDeclined(
        spark.read.parquet(fact).join(dim1, Seq("k1"), "full_outer")
          .groupBy("region").agg(count(lit(1)).as("n")),
        fact, "full-outer")
      def rightPreserved() = dim1
        .join(spark.read.parquet(fact), Seq("k1"), "right_outer")
        .groupBy("region")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .orderBy("region")
      assertFired(rightPreserved(), fact, state)
      assertOnEqualsOff(rightPreserved _)
    }
  }

  test("left-semi and left-anti joins on a key: fire and match") {
    withStar { (fact, state, dim1, _) =>
      def semi() = spark.read.parquet(fact)
        .join(dim1, Seq("k1"), "left_semi")
        .groupBy("k2").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .orderBy("k2")
      def anti() = spark.read.parquet(fact)
        .join(dim1, Seq("k1"), "left_anti")
        .groupBy("k2").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .orderBy("k2")
      assertFired(semi(), fact, state)
      assertFired(anti(), fact, state)
      assertOnEqualsOff(semi _)
      assertOnEqualsOff(anti _)
    }
  }

  test("SQL text star query fires (TPC-H Q5 shape)") {
    withStar { (fact, state, dim1, dim2) =>
      spark.read.parquet(fact).createOrReplaceTempView("star_fact")
      dim1.createOrReplaceTempView("star_dim1")
      dim2.createOrReplaceTempView("star_dim2")
      try {
        def q() = spark.sql(
          """SELECT zone, sum(v) AS s, count(*) AS n
            |FROM star_fact f
            |JOIN star_dim1 d1 ON f.k1 = d1.k1
            |JOIN star_dim2 d2 ON d1.region = d2.region
            |WHERE d2.zone <> 'z9'
            |GROUP BY zone ORDER BY zone""".stripMargin)
        assertFired(q(), fact, state)
        assertOnEqualsOff(q _)
      } finally Seq("star_fact", "star_dim1", "star_dim2")
        .foreach(spark.catalog.dropTempView)
    }
  }

  test("downstream HAVING/sort on the rewritten star output keep working") {
    withStar { (fact, state, dim1, _) =>
      def q() = spark.read.parquet(fact)
        .join(dim1, Seq("k1"))
        .groupBy("region")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .filter(col("s") > 3)
        .withColumn("per", col("s").cast("double") / col("n"))
        .orderBy(desc("per"))
      assertFired(q(), fact, state)
      assertOnEqualsOff(q _)
    }
  }
}
