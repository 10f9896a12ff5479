package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.tools.AdvisorLoop

/** [[AdvisorLoop]] closes the advisor feedback loop with measurements:
  * a synthetic hot-filter workload over an unclustered versioned table
  * must read STRICTLY fewer files after the recommended layout lands, and
  * the aggregate workload must read strictly fewer bytes once the
  * recommended view is materialized — with identical results throughout.
  */
class AdvisorLoopSpec extends SparkSuite {

  test("hot-filter workload reads strictly fewer files after the recommended layout") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("advloop").toString
    val tbl = tmp + "/tbl"
    // unclustered baseline: ids round-robined across 8 files (every file
    // spans the whole domain), NO manifest stats, no blooms
    val data = spark.range(1600).select(
      col("id"),
      (col("id") % 3).cast("string").as("cat"),
      (col("id") * 2.0).as("v"))
      .repartition(8)
    VersionedTable.commitAppend(data, tbl)

    def t(p: String) = VersionedTable.table(spark, p)
    val workload: AdvisorLoop.Workload = Seq(
      "point" -> (p => t(p).filter(col("id") === 42L)),
      "range" -> (p => t(p).filter(col("id").between(100L, 180L))),
      "agg" -> (p => t(p).groupBy("cat").agg(sum("v").as("s"))))

    val rep = AdvisorLoop.measure(spark, tbl, tmp + "/scratch", workload, layoutFiles = 8)

    // layout: the advisor recommends id range stats; the re-laid-out table
    // must prune the point/range scans below the 8-file baseline
    assert(rep.layoutRec.exists(_.statsCols == Seq("id")), rep.render)
    val filtered = rep.layoutDeltas.filter(d => d.name == "point" || d.name == "range")
    assert(filtered.size == 2)
    filtered.foreach { d =>
      assert(d.before.filesRead == 8, d.render)
      assert(d.after.filesRead < d.before.filesRead, d.render)
      assert(d.after.outputRows == d.before.outputRows, d.render)
    }

    // mv: the advisor recommends the cat/v rollup; once materialized the
    // aggregate stops reading the fact
    assert(rep.mvRec.exists(r => r.groupCols == Seq("cat") && r.valueCol == "v"), rep.render)
    val agg = rep.mvDeltas.find(_.name == "agg").get
    assert(agg.after.bytesRead < agg.before.bytesRead, agg.render)
    assert(agg.after.outputRows == agg.before.outputRows, agg.render)

    // rendered report carries the deltas for the human in the loop
    assert(rep.render.contains("layout applied") && rep.render.contains("mv materialized"))

    // the ONE machine-readable artifact (VERDICT r11 item 8): valid JSON
    // whose parsed fields agree with the typed report, so a workload CI
    // can diff recommendations and measured deltas round-over-round
    import spark.implicits._
    val parsed = spark.read.json(Seq(rep.toJson).toDS)
    assert(parsed.count() == 1 && !parsed.columns.contains("_corrupt_record"),
      rep.toJson)
    val row = parsed.selectExpr(
      "layout.recommendation.stats_cols[0]",
      "size(layout.deltas)",
      "mv.recommendation.group_cols[0]", "mv.recommendation.value_col",
      "size(mv.deltas)").collect()(0)
    assert(row.getString(0) == "id" && row.getInt(1) == workload.size)
    assert(row.getString(2) == "cat" && row.getString(3) == "v" &&
      row.getInt(4) == workload.size)
    val pointBefore = parsed.selectExpr(
      "filter(layout.deltas, d -> d.query = 'point')[0].before.files_read",
      "filter(layout.deltas, d -> d.query = 'point')[0].after.files_read").collect()(0)
    assert(pointBefore.getLong(0) == 8L && pointBefore.getLong(1) < 8L)
  }

  test("bucketing rec measured end-to-end: exchanges drop to zero, rows identical") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("advbucket").toString
    val fact = tmp + "/fact"; val dim = tmp + "/other"
    VersionedTable.commitAppend(
      spark.range(2000).select(col("id").as("fk"), (col("id") * 3.0).as("v")), fact)
    VersionedTable.commitAppend(
      spark.range(1500).select(col("id").as("k"), (col("id") % 7).cast("string").as("c")),
      dim)

    def t(p: String) = VersionedTable.table(spark, p)
    // the same fact⋈other shape twice (different downstream) → the
    // advisor's minTimes=2 repeat gate clears
    val workload: AdvisorLoop.JoinWorkload = Seq(
      "join_count" -> ((a, b) => {
        val fa = t(a); val fb = t(b)
        fa.join(fb, fa("fk") === fb("k")).groupBy("c").agg(count(lit(1)).as("n"))
      }),
      "join_sum" -> ((a, b) => {
        val fa = t(a); val fb = t(b)
        fa.join(fb, fa("fk") === fb("k")).agg(sum("v").as("s"))
      }))

    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // SMJ: the shuffle is visible
    try {
      val rep = AdvisorLoop.measureBucketing(
        spark, fact, dim, tmp + "/scratch", workload, minSideBytes = 0L)
      // the advisor recommended THIS pair on THIS key
      assert(rep.rec.exists(_.keys == "fk=k"), rep.render)
      assert(rep.rec.exists(_.timesSeen == 2), rep.render)
      assert(rep.deltas.size == workload.size)
      rep.deltas.foreach { d =>
        // before: both sides crossed the wire; after: the join itself is
        // exchange-free (the only shuffles left are the tiny final aggs)
        assert(d.before.shuffleBytesWritten > 0, d.render)
        assert(d.after.shuffleBytesWritten < d.before.shuffleBytesWritten, d.render)
        assert(d.after.outputRows == d.before.outputRows, d.render)
      }
      // strongest form on the raw join: re-plan against the bucketed pair
      // and count exchanges on the executed plan — ZERO
      val ba = tmp + "/scratch/bucket_a"; val bb = tmp + "/scratch/bucket_b"
      val fba = t(ba); val fbb = t(bb)
      val joined = fba.join(fbb, fba("fk") === fbb("k"))
      val m = graft.tools.PlanMetrics.run(joined)
      assert(m.shuffleBytesWritten == 0 && m.shuffleRecordsWritten == 0,
        s"co-bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      assert(!m.nodes.exists(_.node.contains("Exchange")),
        s"no exchange of any kind expected:\n${m.nodes.map(_.node).mkString(", ")}")
      assert(joined.count() == 1500)
      // JSON artifact parses and carries the rec + deltas
      val parsed = spark.read.json(Seq(rep.toJson).toDS)
      assert(!parsed.columns.contains("_corrupt_record"), rep.toJson)
      val row = parsed.selectExpr(
        "bucketing.recommendation.keys", "bucketing.recommendation.n_buckets",
        "size(bucketing.deltas)").collect()(0)
      assert(row.getString(0) == "fk=k" && row.getLong(1) >= 8L && row.getInt(2) == 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
  }
}
