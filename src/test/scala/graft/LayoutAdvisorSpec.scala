package graft

import org.apache.spark.sql.functions._

import graft.tools.LayoutAdvisor

/** Layout-feedback loop ([[LayoutAdvisor]]): a synthetic workload with a
  * hot range-filtered column, a point-lookup column, and a stray ad-hoc
  * filter must yield exactly the hot columns in the recommended layout —
  * stats for the range column, bloom for the point-lookup column, Z-order
  * only when hot columns co-occur in one query. Report only: recording
  * and recommending must never touch the table. */
class LayoutAdvisorSpec extends SparkSuite {

  test("hot filter columns drive stats/bloom/z-order recommendations") {
    val dir = java.nio.file.Files.createTempDirectory("layout_adv").toString + "/t"
    spark.range(1000)
      .selectExpr("id", "id % 97 AS user_id", "CAST(id % 50 AS DOUBLE) AS amount",
        "CAST(id AS STRING) AS label")
      .write.mode("overwrite").parquet(dir)
    val mtimeBefore = new java.io.File(dir).lastModified

    LayoutAdvisor.clear()
    try {
      val t = spark.read.parquet(dir)
      // hot: 5 range scans on amount, 4 point lookups on user_id,
      // one query co-filtering both; stray: one filter on label
      (1 to 4).foreach(i => LayoutAdvisor.record(t.filter(col("amount") > i * 10)))
      LayoutAdvisor.record(t.filter(col("amount") <= 25))
      (1 to 4).foreach(i => LayoutAdvisor.record(t.filter(col("user_id") === i)))
      LayoutAdvisor.record(t.filter(col("user_id") === 7 && col("amount") > 30))
      LayoutAdvisor.record(t.filter(col("label") === "42"))

      val recs = LayoutAdvisor.recommend()
      assert(recs.size == 1)
      val r = recs.head
      assert(r.table.endsWith("/t"))
      // amount: 6 range obs; user_id: 5 eq obs; label: 1 obs < 10% share
      assert(r.statsCols == Seq("amount", "user_id"), r.render)
      assert(r.bloomCols == Seq("user_id"), r.render)
      // amount+user_id co-occur in the combined query -> z-order pair
      assert(r.zOrderCols == Seq("amount", "user_id"), r.render)
      // label is observed but below the share gate, and strings are not
      // long-castable stats candidates anyway
      assert(r.observations.contains("label"))
      assert(r.render.contains("recommend statsCols:  amount, user_id"))
      // report only — the table itself is untouched
      assert(new java.io.File(dir).lastModified == mtimeBefore)
    } finally LayoutAdvisor.clear()
  }

  test("repeated big-big equi-joins earn a bucketing recommendation; small sides do not") {
    val root = java.nio.file.Files.createTempDirectory("layout_bk").toString
    val a = root + "/a"; val b = root + "/b"; val tiny = root + "/tiny"
    spark.range(2000).selectExpr("id", "id * 2 AS va").write.parquet(a)
    spark.range(1500).selectExpr("id", "id * 3 AS vb").write.parquet(b)
    spark.range(10).selectExpr("id", "id AS vt").write.parquet(tiny)
    LayoutAdvisor.clear()
    try {
      val ta = spark.read.parquet(a); val tb = spark.read.parquet(b)
      val tt = spark.read.parquet(tiny)
      // the repeated fact-to-fact join (3x) and a one-off (1x)
      (1 to 3).foreach(_ => LayoutAdvisor.recordJoins(ta.join(tb, "id")))
      LayoutAdvisor.recordJoins(ta.join(tt, "id"))
      // threshold below the fixture sizes so the big-big pair qualifies
      val recs = LayoutAdvisor.recommendBucketing(
        minTimes = 2, minSideBytes = 1024, targetBucketBytes = 256L * 1024 * 1024)
      assert(recs.size == 1, s"exactly the repeated big-big pair: $recs")
      val r = recs.head
      assert(r.keys == "id=id" && r.timesSeen == 3)
      assert(Set(r.tableA, r.tableB).exists(_.endsWith("/a")) &&
        Set(r.tableA, r.tableB).exists(_.endsWith("/b")))
      assert(r.nBuckets == 8, "floor of 8 buckets for small fixtures")
      assert(r.shuffleBytesSavedPerQuery == r.bytesA + r.bytesB)
      // the tiny side never qualifies even when repeated: broadcast wins
      (1 to 3).foreach(_ => LayoutAdvisor.recordJoins(ta.join(tt, "id")))
      val recs2 = LayoutAdvisor.recommendBucketing(
        minTimes = 2, minSideBytes = 10000) // above the 10-row table, below a/b
      assert(recs2.size == 1, "small-side joins recommend by omission")
    } finally LayoutAdvisor.clear()
  }

  test("no z-order recommendation without a co-filtered pair") {
    val dir = java.nio.file.Files.createTempDirectory("layout_adv2").toString + "/t"
    spark.range(100).selectExpr("id", "id % 7 AS a", "id % 11 AS b")
      .write.mode("overwrite").parquet(dir)
    LayoutAdvisor.clear()
    try {
      val t = spark.read.parquet(dir)
      (1 to 3).foreach(i => LayoutAdvisor.record(t.filter(col("a") > i)))
      (1 to 3).foreach(i => LayoutAdvisor.record(t.filter(col("b") > i)))
      val r = LayoutAdvisor.recommend().head
      assert(r.statsCols.toSet == Set("a", "b"))
      assert(r.zOrderCols.isEmpty, r.render)
    } finally LayoutAdvisor.clear()
  }

  test("ad-hoc one-off filters fall below the share gate") {
    val dir = java.nio.file.Files.createTempDirectory("layout_adv3").toString + "/t"
    spark.range(100).selectExpr("id", "id % 7 AS hot", "id % 3 AS rare")
      .write.mode("overwrite").parquet(dir)
    LayoutAdvisor.clear()
    try {
      val t = spark.read.parquet(dir)
      (1 to 19).foreach(i => LayoutAdvisor.record(t.filter(col("hot") === i)))
      LayoutAdvisor.record(t.filter(col("rare") > 1))
      val r = LayoutAdvisor.recommend().head
      assert(r.statsCols == Seq("hot"))
      assert(r.bloomCols == Seq("hot"))
    } finally LayoutAdvisor.clear()
  }
}
