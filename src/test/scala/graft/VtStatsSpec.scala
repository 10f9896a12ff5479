package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Manifest-derived planner statistics ([[VersionedTable.plannerStats]]
  * surfaced through the DSv2 scan's SupportsReportStatistics): a small
  * vt dim must broadcast at PLAN time (AQE off — without reported stats
  * a DSv2 relation defaults to Long.Max bytes and never broadcasts),
  * and the reported numbers must match the manifest. */
class VtStatsSpec extends SparkSuite {
  import spark.implicits._

  test("small vt dim joins as broadcast at plan time with AQE off") {
    val tmp = java.nio.file.Files.createTempDirectory("vtstats").toString
    val dim = tmp + "/dim"
    VersionedTable.commitAppend(
      (0L until 50L).map(i => (i, s"name_$i")).toDF("k", "nm"), dim)
    spark.conf.set("spark.sql.catalog.vtst", classOf[graft.sources.VtCatalog].getName)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = spark.range(100000).select(
        (col("id") % 50).as("k"), (col("id") * 2.0).as("v"))
      val joined = fact.join(spark.sql(s"SELECT * FROM vtst.`$dim`"), "k")
      val hasBroadcast = joined.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin")
      assert(hasBroadcast,
        s"vt dim should broadcast at plan time:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 100000L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("plannerStats reports manifest bytes and exact recorded rows, never scanning") {
    val tmp = java.nio.file.Files.createTempDirectory("vtstats2").toString
    val path = tmp + "/t"
    VersionedTable.commitAppend(
      (0L until 200L).map(i => (i, s"r$i")).toDF("id", "v"), path, "id")
    val (bytes, rows) = VersionedTable.plannerStats(spark, path)
    assert(bytes > 0L)
    assert(rows.contains(200L), s"recorded counts should give exact rows, got $rows")
    // a stats-less write path (overwrite) has no recorded counts: rows
    // absent rather than a fallback scan
    VersionedTable.commitOverwrite(
      (0L until 10L).map(i => (i, "x")).toDF("id", "v"), path)
    val (b2, r2) = VersionedTable.plannerStats(spark, path)
    assert(b2 > 0L)
    if (r2.isDefined) assert(r2.contains(10L)) // fine if this path records counts
    // time travel reports the OLD snapshot
    assert(VersionedTable.plannerStats(spark, path, Some(1L))._2.contains(200L))
  }
}
