package graft

import org.apache.spark.sql.functions._

import graft.ops.TableStats

class TableStatsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")

  test("exact fields match direct per-column aggregation") {
    val stats = TableStats.collect(li, Seq("l_orderkey", "l_returnflag", "l_quantity"))
      .collect().map(r => r.getString(0) -> r).toMap
    val direct = li.agg(
      min("l_orderkey").cast("string"), max("l_orderkey").cast("string"),
      min("l_returnflag"), max("l_returnflag"),
      count(lit(1))).head()
    assert(stats("l_orderkey").getString(1) == direct.getString(0))
    assert(stats("l_orderkey").getString(2) == direct.getString(1))
    assert(stats("l_returnflag").getString(1) == direct.getString(2))
    assert(stats("l_returnflag").getString(2) == direct.getString(3))
    assert(stats.values.forall(_.getLong(5) == direct.getLong(4)))
    assert(stats.values.forall(_.getLong(3) == 0L)) // fixtures have no nulls here
  }

  test("null counts see real nulls") {
    val df = Seq(Some(1), None, Some(3), None, None).toDF("v")
    val row = TableStats.collect(df, Seq("v")).head()
    assert(row.getLong(3) == 3L) // null_count
    assert(row.getLong(5) == 5L) // row_count
    assert(row.getString(1) == "1" && row.getString(2) == "3")
  }

  test("NDV estimate lands within HLL error of exact distinct") {
    val exact = li.select(countDistinct("l_orderkey"), countDistinct("l_returnflag")).head()
    val stats = TableStats.collect(li, Seq("l_orderkey", "l_returnflag"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // approx_count_distinct default rsd = 5%; allow 3x margin
    assert(math.abs(stats("l_orderkey") - exact.getLong(0)).toDouble / exact.getLong(0) < 0.15)
    assert(stats("l_returnflag") == exact.getLong(1)) // tiny cardinality: exact
  }

  test("four-column ANALYZE costs the same jobs as a one-column aggregate") {
    // AQE materializes the partial-agg exchange as its own job, so the
    // absolute count is a Spark-version detail; the ONE-PASS claim is that
    // adding columns adds NO jobs (the per-column re-scan pattern would
    // multiply them).
    def countJobs(group: String)(action: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try action
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val baseline = countJobs("ts_baseline")(
      li.agg(min("l_orderkey")).write.format("noop").mode("overwrite").save())
    val stats = TableStats.collect(
      li, Seq("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"))
    val jobs = countJobs("ts_one_pass")(
      stats.write.format("noop").mode("overwrite").save())
    assert(
      jobs == baseline,
      s"4-column ANALYZE took $jobs jobs vs $baseline for one column")
  }

  test("uniqueKeyCandidates flags the key, not the low-cardinality column") {
    val stats = TableStats.collect(
      li.select(monotonically_increasing_id().as("rid"), col("l_returnflag")),
      Seq("rid", "l_returnflag"))
    val candidates = TableStats.uniqueKeyCandidates(stats)
      .select("column").as[String].collect().toSet
    assert(candidates == Set("rid"))
  }

  test("clusteringDepth: disjoint slabs read ~1-deep, round-robin reads ~F-deep") {
    import graft.io.VersionedTable
    val tmp = java.nio.file.Files.createTempDirectory("clustdepth").toString
    // four disjoint id slabs: every file overlaps only itself
    val good = tmp + "/good"
    for (s <- 0 until 4)
      VersionedTable.commitAppend(
        (s * 100L until s * 100L + 50L).map(i => (i, s"r$i")).toDF("id", "v")
          .coalesce(1),
        good, "id")
    val (fG, avgG, maxG) = VersionedTable.clusteringDepth(spark, good, "id")
    assert(fG == 4 && avgG == 0.0 && maxG == 1, s"($fG, $avgG, $maxG)")

    // round-robin: every file spans the whole domain
    val bad = tmp + "/bad"
    VersionedTable.commitAppend(
      (0L until 400L).map(i => (i, s"r$i")).toDF("id", "v").repartition(4),
      bad, "id")
    val (fB, avgB, maxB) = VersionedTable.clusteringDepth(spark, bad, "id")
    assert(fB == 4 && avgB == 3.0 && maxB == 4, s"($fB, $avgB, $maxB)")

    // a column without recorded stats refuses with the remediation hint
    val e = intercept[IllegalArgumentException](
      VersionedTable.clusteringDepth(spark, bad, "v"))
    assert(e.getMessage.contains("ANALYZE"))
  }
}
