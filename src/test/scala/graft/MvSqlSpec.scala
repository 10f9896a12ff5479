package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.plans.MvRewrite

/** Statement-text materialized views ([[graft.sources.VtCreateMvCommand]]
  * family, VERDICT r11 item 3): CREATE over a parquet fact and over a
  * versioned fact, SQL queries provably served from the state, REFRESH
  * through the CDF (and across a registry wipe, i.e. a new session), DROP
  * unregisters and deletes, and the definition grammar refuses the shapes
  * the rewriter could not serve correctly. */
class MvSqlSpec extends SparkSuite {
  import spark.implicits._

  private val ConfKey = "spark.graft.mvrewrite.enabled"

  private def scanRoots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.toSet

  test("CREATE over a parquet fact: statement query served, DROP stops it") {
    val tmp = java.nio.file.Files.createTempDirectory("mvsql_pq").toString
    val fact = tmp + "/fact.parquet"
    (0L until 300L).map(i => (i, s"k${i % 4}", i * 2.0)).toDF("id", "k", "v")
      .write.parquet(fact)
    val view = tmp + "/state"
    val created = spark.sql(
      s"CREATE MATERIALIZED VIEW `$view` AS SELECT k, SUM(v) FROM parquet.`$fact` GROUP BY k")
      .collect()(0)
    assert(created.getAs[String]("group_cols") == "k")
    assert(created.getAs[String]("value_col") == "v")
    assert(!created.getAs[Boolean]("maintained"))
    spark.conf.set(ConfKey, "true")
    try {
      def q() = spark.sql(
        s"SELECT k, count(*) AS n, sum(v) AS s, avg(v) AS a FROM parquet.`$fact` GROUP BY k ORDER BY k")
      val direct = { // the truth, computed with the rewriter off
        spark.conf.set(ConfKey, "false")
        try q().collect().toSeq finally spark.conf.set(ConfKey, "true")
      }
      assert(!scanRoots(q()).exists(_.endsWith("fact.parquet")),
        s"fact scan survived: ${scanRoots(q())}")
      assert(q().collect().toSeq == direct)

      val dropped = spark.sql(s"DROP MATERIALIZED VIEW `$view`").collect()(0)
      assert(dropped.getAs[Boolean]("dropped"))
      assert(scanRoots(q()).exists(_.endsWith("fact.parquet")),
        "rewrite must stop after DROP")
      assert(!new java.io.File(view).exists(), "DROP must delete the state")
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("DROP refuses a target that is not a materialized view — the table survives") {
    val tmp = java.nio.file.Files.createTempDirectory("mvsql_drop").toString
    val tbl = tmp + "/events"
    VersionedTable.commitAppend(
      (0L until 50L).map(i => (i, s"r$i")).toDF("id", "v"), tbl)
    // a plain versioned table has no _mv.json and no rewriter registration:
    // DROP MATERIALIZED VIEW against it must refuse, not recursively delete
    val e = intercept[Exception](spark.sql(s"DROP MATERIALIZED VIEW `$tbl`").collect())
    assert(e.getMessage.contains("not a materialized view"))
    assert(VersionedTable.read(spark, tbl).count() == 50, "table must be untouched")
    // same for an arbitrary non-MV directory
    val dir = tmp + "/plain"
    (0 until 5).toDF("x").write.parquet(dir)
    val e2 = intercept[Exception](spark.sql(s"DROP MATERIALIZED VIEW `$dir`").collect())
    assert(e2.getMessage.contains("not a materialized view"))
    assert(new java.io.File(dir).exists())
  }

  test("CREATE over a vt fact: maintained; REFRESH tracks the fact across a new session") {
    val tmp = java.nio.file.Files.createTempDirectory("mvsql_vt").toString
    val src = tmp + "/fact"; val view = tmp + "/view"
    def rows(ids: Range) =
      ids.map(i => (i.toLong, s"k${i % 3}", i * 2.0)).toDF("id", "k", "v")
    VersionedTable.commitAppend(rows(0 until 90), src)
    spark.conf.set("spark.sql.catalog.vtmv", classOf[graft.sources.VtCatalog].getName)
    val created = spark.sql(
      s"CREATE MATERIALIZED VIEW `$view` AS SELECT k, SUM(v), COUNT(*) FROM vtmv.`$src` GROUP BY k")
      .collect()(0)
    assert(created.getAs[Boolean]("maintained"))
    spark.conf.set(ConfKey, "true")
    try {
      def q() = spark.sql(
        s"SELECT k, count(*) AS n, sum(v) AS s FROM vtmv.`$src` GROUP BY k ORDER BY k")
      def direct() = {
        spark.conf.set(ConfKey, "false")
        try q().collect().toSeq finally spark.conf.set(ConfKey, "true")
      }
      def served() = q().queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => s
      }.isEmpty
      assert(served(), "fact DSv2 scan survived")
      assert(q().collect().toSeq == direct())
      assert(q().collect().map(_.getLong(1)).sum == 90L)

      // fact moves on; REFRESH re-converges through the CDF
      VersionedTable.commitAppend(rows(90 until 120), src)
      val r = spark.sql(s"REFRESH MATERIALIZED VIEW `$view`").collect()(0)
      assert(r.getAs[Boolean]("refreshed"))
      assert(served() && q().collect().map(_.getLong(1)).sum == 120L)
      assert(q().collect().toSeq == direct())

      // a NEW session has an empty registry: REFRESH alone re-registers
      // (the definition rides in <view>/_mv.json)
      MvRewrite.clear()
      assert(!served(), "cleared registry must not rewrite")
      spark.sql(s"REFRESH MATERIALIZED VIEW `$view`")
      assert(served() && q().collect().toSeq == direct())

      // current-version no-op refresh reports refreshed=false
      assert(!spark.sql(s"REFRESH MATERIALIZED VIEW `$view`")
        .collect()(0).getAs[Boolean]("refreshed"))
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("definition grammar refuses what the rewriter could not serve") {
    val tmp = java.nio.file.Files.createTempDirectory("mvsql_bad").toString
    val fact = tmp + "/f.parquet"
    Seq((1L, "a", 2.0, 3.0)).toDF("id", "k", "v", "w").write.parquet(fact)
    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](spark.sql(sql))
      assert(e.getMessage.contains(needle), s"$sql → ${e.getMessage}")
    }
    val mk = s"CREATE MATERIALIZED VIEW `$tmp/x` AS"
    refuse(s"$mk SELECT k, SUM(v) FROM parquet.`$fact` WHERE v > 0 GROUP BY k",
      "no WHERE/subquery")
    refuse(s"$mk SELECT k, SUM(v), MAX(w) FROM parquet.`$fact` GROUP BY k",
      "one state vector covers one value column")
    refuse(s"$mk SELECT k, SUM(v) FROM parquet.`$fact` GROUP BY 1",
      "column names")
    refuse(s"$mk SELECT k, COUNT(DISTINCT v) FROM parquet.`$fact` GROUP BY k",
      "DISTINCT")
    refuse(s"$mk SELECT k, STDDEV(v) FROM parquet.`$fact` GROUP BY k",
      "not decomposable")
    refuse(s"$mk SELECT k, SUM(k) FROM parquet.`$fact` GROUP BY k",
      "GROUP BY key")
    refuse(s"$mk SELECT k, v FROM parquet.`$fact`",
      "GROUP BY aggregate")
    // REFRESH needs a created view; a bare directory refuses loudly
    refuse(s"REFRESH MATERIALIZED VIEW `$tmp`", "_mv.json")
  }

  test("star CREATE: dim-joined definition lowers to a fact rollup and serves star queries") {
    val tmp = java.nio.file.Files.createTempDirectory("mvsql_star").toString
    val fact = tmp + "/fact.parquet"; val dim = tmp + "/dim.parquet"
    (0L until 200L).map(i => (i, i % 7, i * 1.5)).toDF("id", "fk", "v")
      .write.parquet(fact)
    (0L until 7L).map(k => (k, s"name_${k % 3}", if (k < 4) "east" else "west"))
      .toDF("d_k", "d_name", "d_region").write.parquet(dim)
    val view = tmp + "/state"
    val created = spark.sql(
      s"""CREATE MATERIALIZED VIEW `$view` AS
         |SELECT d_name, SUM(v) FROM parquet.`$fact`
         |JOIN parquet.`$dim` ON fk = d_k GROUP BY d_name""".stripMargin).collect()(0)
    // the LOWERED spec: state keyed by the fact-side join key, never the dim key
    assert(created.getAs[String]("group_cols") == "fk")
    assert(created.getAs[String]("value_col") == "v")
    spark.conf.set(ConfKey, "true")
    try {
      // a DIFFERENT star query than the definition: dim filter + richer aggs
      def q() = spark.sql(
        s"""SELECT d_name, count(*) AS n, sum(v) AS s, round(avg(v), 6) AS a
           |FROM parquet.`$fact` JOIN parquet.`$dim` ON fk = d_k
           |WHERE d_region = 'east' GROUP BY d_name ORDER BY d_name""".stripMargin)
      val direct = {
        spark.conf.set(ConfKey, "false")
        try q().collect().toSeq finally spark.conf.set(ConfKey, "true")
      }
      assert(!scanRoots(q()).exists(_.endsWith("fact.parquet")),
        s"fact scan survived the star rewrite: ${scanRoots(q())}")
      assert(q().collect().toSeq == direct)
      // SHOW lists the lowered spec like any rollup
      val shown = spark.sql(s"SHOW MATERIALIZED VIEWS IN `$tmp`").collect()
      assert(shown.length == 1 && shown(0).getString(2) == "fk")
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("star CREATE over a vt fact is maintained; fact-side group keys join the state keys") {
    val tmp = java.nio.file.Files.createTempDirectory("mvsql_star_vt").toString
    val src = tmp + "/fact"; val dim = tmp + "/dim.parquet"; val view = tmp + "/view"
    def rows(ids: Range) =
      ids.map(i => (i.toLong, i % 5L, s"f${i % 2}", i * 1.0)).toDF("id", "fk", "fcat", "v")
    VersionedTable.commitAppend(rows(0 until 100), src)
    (0L until 5L).map(k => (k, s"d${k % 2}")).toDF("d_k", "d_name").write.parquet(dim)
    spark.conf.set("spark.sql.catalog.vtstar", classOf[graft.sources.VtCatalog].getName)
    val created = spark.sql(
      s"""CREATE MATERIALIZED VIEW `$view` AS
         |SELECT d_name, fcat, SUM(v) FROM vtstar.`$src`
         |JOIN parquet.`$dim` ON fk = d_k GROUP BY d_name, fcat""".stripMargin).collect()(0)
    assert(created.getAs[Boolean]("maintained"))
    // join key + the FACT-side group key; the dim group key stays out
    assert(created.getAs[String]("group_cols") == "fk,fcat")
    spark.conf.set(ConfKey, "true")
    try {
      def q() = spark.sql(
        s"""SELECT d_name, fcat, count(*) AS n, sum(v) AS s
           |FROM vtstar.`$src` JOIN parquet.`$dim` ON fk = d_k
           |GROUP BY d_name, fcat ORDER BY d_name, fcat""".stripMargin)
      def factScanGone() = q().queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => s
      }.isEmpty
      val direct = {
        spark.conf.set(ConfKey, "false")
        try q().collect().toSeq finally spark.conf.set(ConfKey, "true")
      }
      assert(factScanGone(), "vt fact scan survived the star rewrite")
      assert(q().collect().toSeq == direct)
      // the fact moves; REFRESH re-converges the star state through the CDF
      VersionedTable.commitAppend(rows(100 until 140), src)
      assert(spark.sql(s"REFRESH MATERIALIZED VIEW `$view`")
        .collect()(0).getAs[Boolean]("refreshed"))
      assert(factScanGone() && q().collect().map(_.getLong(2)).sum == 140L)
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("star grammar refuses outer joins, non-equi links, dim aggregates, fact-fact links") {
    val tmp = java.nio.file.Files.createTempDirectory("mvsql_star_bad").toString
    val fact = tmp + "/fact.parquet"; val dim = tmp + "/dim.parquet"
    Seq((1L, 2L, 3.0)).toDF("id", "fk", "v").write.parquet(fact)
    Seq((2L, "a", 9.0)).toDF("d_k", "d_name", "d_val").write.parquet(dim)
    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](spark.sql(sql).collect())
      assert(e.getMessage.contains(needle), s"$sql → ${e.getMessage}")
    }
    val mk = s"CREATE MATERIALIZED VIEW `$tmp/x` AS"
    val from = s"FROM parquet.`$fact` "
    refuse(s"$mk SELECT d_name, SUM(v) $from LEFT JOIN parquet.`$dim` ON fk = d_k GROUP BY d_name",
      "INNER joins only")
    refuse(s"$mk SELECT d_name, SUM(v) $from JOIN parquet.`$dim` ON fk < d_k GROUP BY d_name",
      "column equalities")
    refuse(s"$mk SELECT d_name, SUM(d_val) $from JOIN parquet.`$dim` ON fk = d_k GROUP BY d_name",
      "not a fact column")
    refuse(s"$mk SELECT d_name, SUM(v) $from JOIN parquet.`$dim` ON id = fk GROUP BY d_name",
      "both sides")
    refuse(s"$mk SELECT d_name, SUM(v) $from JOIN parquet.`$dim` ON d_name = d_val GROUP BY d_name",
      "no join condition links the fact")
  }

  test("SHOW MATERIALIZED VIEWS discovers definitions and session registration") {
    val wh = java.nio.file.Files.createTempDirectory("mvsql_show").toString
    val fact = wh + "/fact.parquet"
    (0L until 60L).map(i => (i, s"k${i % 3}", i * 1.0)).toDF("id", "k", "v")
      .write.parquet(fact)
    spark.sql(
      s"CREATE MATERIALIZED VIEW `$wh/mv1` AS SELECT k, SUM(v) FROM parquet.`$fact` GROUP BY k")
    spark.sql(
      s"CREATE MATERIALIZED VIEW `$wh/mv2` AS SELECT k, COUNT(*) FROM parquet.`$fact` GROUP BY k")
    try {
      def rows() = spark.sql(s"SHOW MATERIALIZED VIEWS IN `$wh`").collect()
        .map(r => (r.getString(0).split('/').last, r.getString(3), r.getBoolean(5)))
      assert(rows().toSeq == Seq(("mv1", "v", true), ("mv2", "", true)))
      // a fresh session (empty registry) sees the definitions, unregistered
      MvRewrite.clear()
      assert(rows().toSeq == Seq(("mv1", "v", false), ("mv2", "", false)))
      // the catalog form resolves through the warehouse conf
      spark.conf.set("spark.sql.catalog.vtshow", classOf[graft.sources.VtCatalog].getName)
      spark.conf.set("spark.sql.catalog.vtshow.warehouse", wh)
      assert(spark.sql("SHOW MATERIALIZED VIEWS IN vtshow").count() == 2)
    } finally MvRewrite.clear()
  }

  test("REFRESH MATERIALIZED VIEWS IN refreshes every maintained view in one statement") {
    val wh = java.nio.file.Files.createTempDirectory("mvsql_all").toString
    def rows(ids: Range, k: Int) =
      ids.map(i => (i.toLong, s"k${i % k}", i * 1.0)).toDF("id", "k", "v")
    VersionedTable.commitAppend(rows(0 until 30, 3), wh + "/f1")
    VersionedTable.commitAppend(rows(0 until 40, 4), wh + "/f2")
    spark.conf.set("spark.sql.catalog.vtall", classOf[graft.sources.VtCatalog].getName)
    spark.conf.set("spark.sql.catalog.vtall.warehouse", wh)
    spark.sql(s"CREATE MATERIALIZED VIEW `$wh/mv1` AS SELECT k, SUM(v) FROM vtall.`$wh/f1` GROUP BY k")
    spark.sql(s"CREATE MATERIALIZED VIEW `$wh/mv2` AS SELECT k, COUNT(*) FROM vtall.`$wh/f2` GROUP BY k")
    // plus a one-shot parquet view: listed as skipped, never refreshed
    val fact = wh + "/fact.parquet"
    rows(0 until 10, 2).write.parquet(fact)
    spark.sql(s"CREATE MATERIALIZED VIEW `$wh/mv3` AS SELECT k, SUM(v) FROM parquet.`$fact` GROUP BY k")
    try {
      // facts move on; a fresh session (cleared registry) heals in ONE statement
      VersionedTable.commitAppend(rows(30 until 60, 3), wh + "/f1")
      VersionedTable.commitAppend(rows(40 until 50, 4), wh + "/f2")
      MvRewrite.clear()
      val out = spark.sql("REFRESH MATERIALIZED VIEWS IN vtall").collect()
        .map(r => (r.getString(0).split('/').last, r.getBoolean(1), r.getBoolean(2)))
        .sortBy(_._1)
      assert(out.toSeq == Seq(("mv1", true, true), ("mv2", true, true), ("mv3", false, false)))
      spark.conf.set(ConfKey, "true")
      val served = spark.sql(
        s"SELECT k, count(*) AS n, sum(v) AS s FROM vtall.`$wh/f1` GROUP BY k")
      assert(served.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => s
      }.isEmpty, "refreshed view must serve after the registry wipe")
      assert(served.collect().map(_.getLong(1)).sum == 60L)
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  test("count-only definition serves count(*) and declines value aggregates") {
    val tmp = java.nio.file.Files.createTempDirectory("mvsql_cnt").toString
    val fact = tmp + "/fact.parquet"
    (0L until 100L).map(i => (i, s"k${i % 5}", i * 1.0)).toDF("id", "k", "v")
      .write.parquet(fact)
    val view = tmp + "/state"
    val created = spark.sql(
      s"CREATE MATERIALIZED VIEW `$view` AS SELECT k, COUNT(*) FROM parquet.`$fact` GROUP BY k")
      .collect()(0)
    assert(created.getAs[String]("value_col") == "")
    spark.conf.set(ConfKey, "true")
    try {
      def counts() = spark.sql(
        s"SELECT k, count(*) AS n FROM parquet.`$fact` GROUP BY k ORDER BY k")
      assert(!scanRoots(counts()).exists(_.endsWith("fact.parquet")))
      assert(counts().collect().map(_.getLong(1)).sum == 100L)
      // sum needs state the view does not carry: decline, stay correct
      def sums() = spark.sql(
        s"SELECT k, sum(v) AS s FROM parquet.`$fact` GROUP BY k ORDER BY k")
      assert(scanRoots(sums()).exists(_.endsWith("fact.parquet")), "expected decline")
      assert(sums().collect().map(_.getDouble(1)).sum == (0 until 100).map(_ * 1.0).sum)
    } finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }
}
