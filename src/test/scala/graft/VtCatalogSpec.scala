package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** SQL-first lifecycle of the versioned table through
  * [[graft.sources.VtCatalog]]: DDL, DML, snapshot + time-travel reads,
  * rename, constraints, and the pushed-filter translation that feeds the
  * inner scan's file pruning. */
class VtCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val wh: String = {
    val w = Files.createTempDirectory("vt_warehouse").toString
    spark.conf.set("spark.sql.catalog.vtt", classOf[graft.sources.VtCatalog].getName)
    spark.conf.set("spark.sql.catalog.vtt.warehouse", w)
    w
  }

  test("CREATE / INSERT INTO / SELECT / VERSION AS OF / TIMESTAMP AS OF round-trip") {
    wh
    spark.sql("CREATE TABLE vtt.t1 (id BIGINT, v STRING)")
    assert(spark.sql("SELECT * FROM vtt.t1").count() == 0, "fresh table reads empty")
    spark.sql("INSERT INTO vtt.t1 SELECT id, CONCAT('a', id) FROM RANGE(10)")
    spark.sql("INSERT INTO vtt.t1 SELECT id, CONCAT('b', id) FROM RANGE(10, 15)")
    assert(spark.sql("SELECT COUNT(*) FROM vtt.t1").head().getLong(0) == 15)
    // version 1 = create, 2 = first insert, 3 = second
    assert(spark.sql("SELECT COUNT(*) FROM vtt.t1 VERSION AS OF 2").head().getLong(0) == 10)
    assert(spark.sql("SELECT COUNT(*) FROM vtt.t1 VERSION AS OF 1").head().getLong(0) == 0)
    // a timestamp after the last commit resolves to the latest version
    val after = java.time.Instant.ofEpochMilli(System.currentTimeMillis() + 60000)
    assert(spark.sql(s"SELECT COUNT(*) FROM vtt.t1 TIMESTAMP AS OF '$after'")
      .head().getLong(0) == 15)
    // filters + projection through the seam
    assert(spark.sql("SELECT v FROM vtt.t1 WHERE id = 12").collect().toSeq ==
      Seq(Row("b12")))
  }

  test("INSERT OVERWRITE replaces; the pre-overwrite snapshot still time-travels") {
    wh
    spark.sql("CREATE TABLE vtt.t2 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO vtt.t2 SELECT id, 'x' FROM RANGE(100)")
    spark.sql("INSERT OVERWRITE vtt.t2 SELECT id, 'y' FROM RANGE(7)")
    assert(spark.sql("SELECT COUNT(*), MIN(v) FROM vtt.t2").head() == Row(7L, "y"))
    assert(spark.sql("SELECT COUNT(*) FROM vtt.t2 VERSION AS OF 2").head().getLong(0) == 100)
  }

  test("ALTER TABLE RENAME COLUMN: new name reads across old files; refusals are typed") {
    wh
    spark.sql("CREATE TABLE vtt.t3 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO vtt.t3 SELECT id, CONCAT('r', id) FROM RANGE(5)")
    spark.sql("ALTER TABLE vtt.t3 RENAME COLUMN v TO label")
    assert(spark.sql("SELECT label FROM vtt.t3 WHERE id = 3").head().getString(0) == "r3")
    val e = intercept[Exception](spark.sql("ALTER TABLE vtt.t3 DROP COLUMN nope"))
    assert(e.getMessage.contains("UNRESOLVED_COLUMN"), e.getMessage)
  }

  test("ALTER TABLE DROP COLUMN: metadata-only, time travel keeps it, re-add refused") {
    wh
    spark.sql("CREATE TABLE vtt.dropc_t (id BIGINT, v STRING, score DOUBLE)")
    spark.sql("INSERT INTO vtt.dropc_t SELECT 1, 'a', 2.5")
    spark.sql("ALTER TABLE vtt.dropc_t DROP COLUMN score")
    assert(spark.sql("SELECT * FROM vtt.dropc_t").columns.toSeq == Seq("id", "v"))
    // data files untouched: the pre-drop snapshot still reads the column
    assert(spark.sql("SELECT score FROM vtt.dropc_t VERSION AS OF 2")
      .head().getDouble(0) == 2.5)
    // writes continue in the narrowed schema
    spark.sql("INSERT INTO vtt.dropc_t SELECT 2, 'b'")
    assert(spark.sql("SELECT COUNT(*) FROM vtt.dropc_t").head().getLong(0) == 2)
    // re-adding the dropped name would resurrect old values: refused
    val e = intercept[Exception](
      spark.sql("ALTER TABLE vtt.dropc_t ADD COLUMN score DOUBLE"))
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    // a fresh name is fine
    spark.sql("ALTER TABLE vtt.dropc_t ADD COLUMN score2 DOUBLE")
    assert(spark.sql("SELECT * FROM vtt.dropc_t").columns.toSeq ==
      Seq("id", "v", "score2"))
    spark.sql("DROP TABLE vtt.dropc_t")
  }

  test("VERSION AS OF resolves named tags; vt_changes accepts tag boundaries") {
    wh
    spark.sql("CREATE TABLE vtt.tagt (id BIGINT, v STRING)")
    spark.sql("INSERT INTO vtt.tagt SELECT 1, 'a'") // v2
    val path = s"$wh/tagt"
    VersionedTable.setTag(spark, path, "rel-1")
    spark.sql("INSERT INTO vtt.tagt SELECT 2, 'b'") // v3
    VersionedTable.setTag(spark, path, "rel-2")
    assert(spark.sql("SELECT COUNT(*) FROM vtt.tagt VERSION AS OF 'rel-1'")
      .head().getLong(0) == 1)
    // release diff purely by names
    val diff = spark.sql(s"SELECT * FROM vt_changes('$path', 'rel-1', 'rel-2')")
      .collect()
    assert(diff.length == 1 && diff(0).getAs[Long]("id") == 2L &&
      diff(0).getAs[String]("_change_type") == "insert")
    val e = intercept[Exception](
      spark.sql("SELECT COUNT(*) FROM vtt.tagt VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("neither") || e.getMessage.contains("nope"))
    spark.sql("DROP TABLE vtt.tagt")
  }

  test("CHECK constraints enforce on SQL INSERT; time-travel identifiers refuse writes") {
    wh
    spark.sql("CREATE TABLE vtt.t4 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO vtt.t4 SELECT id, 'ok' FROM RANGE(3)")
    val path = s"$wh/t4"
    VersionedTable.addCheck(spark, path, "id_nonneg", "id >= 0")
    val e = intercept[Exception](
      spark.sql("INSERT INTO vtt.t4 SELECT -1, 'bad'"))
    assert(
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.getMessage != null) &&
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(8)
        .exists(t => Option(t.getMessage).exists(_.contains("id_nonneg"))),
      s"constraint name should surface, got: ${e.getMessage}")
    assert(spark.sql("SELECT COUNT(*) FROM vtt.t4").head().getLong(0) == 3,
      "refused insert must not commit")
  }

  test("path identifiers: SELECT * FROM vtt.`/abs/path` with no warehouse mapping") {
    wh
    val base = Files.createTempDirectory("vt_pathid").toString + "/tbl"
    VersionedTable.commitAppend(
      (0L until 20L).map(i => (i, s"p$i")).toDF("id", "v"), base, Seq("id"))
    assert(spark.sql(s"SELECT COUNT(*) FROM vtt.`$base` WHERE id < 5").head().getLong(0) == 5)
  }

  test("ALTER TABLE ADD COLUMN: metadata-only, old rows null-fill, writes populate") {
    wh
    spark.sql("CREATE TABLE vtt.addc_t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO vtt.addc_t SELECT 1, 'a'")
    spark.sql("ALTER TABLE vtt.addc_t ADD COLUMN score DOUBLE")
    // history null-fills; the new column is writable
    assert(spark.sql("SELECT score FROM vtt.addc_t").collect()(0).isNullAt(0))
    spark.sql("INSERT INTO vtt.addc_t SELECT 2, 'b', 9.5")
    assert(spark.sql(
      "SELECT COUNT(*), SUM(score) FROM vtt.addc_t").collect().toSeq ==
      Seq(Row(2L, 9.5)))
    // duplicates refuse; the pre-ALTER snapshot still reads the old schema
    intercept[Exception](spark.sql("ALTER TABLE vtt.addc_t ADD COLUMN score DOUBLE"))
    assert(spark.sql("SELECT * FROM vtt.addc_t VERSION AS OF 2").columns.toSeq ==
      Seq("id", "v"))
    spark.sql("DROP TABLE vtt.addc_t")
  }

  test("CREATE TABLE AS SELECT materializes the query as a committed table") {
    wh
    spark.sql(
      "CREATE TABLE vtt.ctas_t AS SELECT id, id * 2 AS v FROM range(100)")
    assert(spark.sql("SELECT COUNT(*), SUM(v) FROM vtt.ctas_t").collect().toSeq ==
      Seq(Row(100L, 9900L)))
    // it is a real versioned table: history exists, further DML works
    assert(VersionedTable.versions(spark, s"$wh/ctas_t").nonEmpty)
    spark.sql("INSERT INTO vtt.ctas_t SELECT 200, 400")
    assert(spark.sql("SELECT COUNT(*) FROM vtt.ctas_t").collect()(0).getLong(0) == 101L)
    // CTAS onto an existing table refuses
    intercept[Exception](
      spark.sql("CREATE TABLE vtt.ctas_t AS SELECT 1 AS x"))
    spark.sql("DROP TABLE vtt.ctas_t")
  }

  test("DROP TABLE removes; SHOW TABLES lists committed tables only") {
    wh
    spark.sql("CREATE TABLE vtt.t5 (id BIGINT)")
    spark.sql("INSERT INTO vtt.t5 SELECT id FROM RANGE(2)")
    val listed = spark.sql("SHOW TABLES IN vtt").collect().map(_.getString(1)).toSet
    assert(listed.contains("t5"))
    spark.sql("DROP TABLE vtt.t5")
    assert(!spark.catalog.tableExists("vtt.t5"))
  }

  test("filter translation covers the pruning grammar; untranslatable filters pass through") {
    import org.apache.spark.sql.sources._
    def t(f: Filter) = graft.sources.VtTable.translate(f)
    assert(t(EqualTo("a", 1)).isDefined)
    assert(t(And(GreaterThan("a", 1), In("b", Array(1, 2)))).isDefined)
    assert(t(Or(IsNull("a"), StringStartsWith("s", "x"))).isDefined)
    assert(t(Not(LessThanOrEqual("a", 5))).isDefined)
    // AlwaysTrue/False translate since the TRUNCATE seam needs them
    assert(t(AlwaysTrue()).isDefined)
    assert(t(AlwaysFalse()).isDefined)
    // a filter shape outside the grammar falls to the residual path and
    // poisons any conjunction it sits in (Spark re-applies every pushed
    // filter above the seam, so dropping is safe — translating a COLLATED
    // comparison as a binary one would over-prune, declining never can)
    val collated = CollatedEqualTo("s", "x",
      org.apache.spark.sql.types.StringType("UTF8_LCASE"))
    assert(t(collated).isEmpty, "unknown filters must fall to the residual path")
    assert(t(And(collated, EqualTo("a", 1))).isEmpty,
      "a conjunction with an untranslatable leg drops entirely (residuals re-apply)")
  }
}
