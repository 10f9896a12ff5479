package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.JoinPlanner

/** The decision layer must pick the right strategy from measured stats —
  * and NEVER change join semantics: every branch is row-compared against
  * the plain join. */
class JoinPlannerSpec extends SparkSuite {
  import spark.implicits._

  private def flatPlan(df: DataFrame): Seq[SparkPlan] =
    df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect { case p => p }
      case p => Seq(p)
    }.flatten

  private def hasBroadcast(df: DataFrame): Boolean =
    flatPlan(df).exists(_.isInstanceOf[BroadcastExchangeExec])

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // uniform large-ish side: 5000 rows over 500 keys
  private lazy val uniform =
    (1 to 5000).map(i => (i % 500L, i.toLong)).toDF("k", "lv")
  // skewed side: 6000 rows, key 7 holds half of them
  private lazy val skewed =
    ((1 to 3000).map(_ => (7L, 1L)) ++ (1 to 3000).map(i => (i % 300L + 100L, 2L)))
      .toDF("k", "lv")
  // small dimension: 40 rows
  private lazy val dim = (0L to 39L).map(k => (k, s"d$k")).toDF("k", "name")
  // mid-size dimension: 600 rows (too big to broadcast under test thresholds)
  private lazy val midDim = (0L to 599L).map(k => (k, s"m$k")).toDF("k", "name")

  test("gatherStats measures rows and finds the planted hot key") {
    val s = JoinPlanner.gatherStats(skewed, "k")
    assert(s.rows == 6000)
    assert(s.topKey.contains("7"))
    assert(s.maybeSkewed(0.2))
    val u = JoinPlanner.gatherStats(uniform, "k")
    assert(u.rows == 5000 && !u.maybeSkewed(0.2))
  }

  test("small side -> broadcast, plan-asserted, rows identical to the plain join") {
    val (joined, d) = JoinPlanner.autoJoin(uniform, dim, Seq("k"), broadcastMaxRows = 100)
    assert(d.strategy == "broadcast-right", d)
    assert(hasBroadcast(joined))
    assert(sortedRows(joined) == sortedRows(uniform.join(dim, Seq("k"))))
    // and mirrored when the LEFT side is the small one
    val (joinedL, dL) = JoinPlanner.autoJoin(dim, uniform, Seq("k"), broadcastMaxRows = 100)
    assert(dL.strategy == "broadcast-left", dL)
    assert(sortedRows(joinedL) == sortedRows(dim.join(uniform, Seq("k"))))
  }

  test("hot key against a replicable dim -> salted, rows identical to the plain join") {
    val (joined, d) = JoinPlanner.autoJoin(
      skewed, midDim, Seq("k"), broadcastMaxRows = 100, skewFraction = 0.2, saltBuckets = 8,
      replicateMaxRows = 10000)
    assert(d.strategy == "salted", d)
    assert(sortedRows(joined) == sortedRows(skewed.join(midDim, Seq("k"))))
  }

  test("no replicable side and no skew -> plain shuffle join") {
    val (joined, d) = JoinPlanner.autoJoin(
      uniform, skewed.withColumnRenamed("lv", "rv"), Seq("k"),
      broadcastMaxRows = 100, skewFraction = 0.9, replicateMaxRows = 100)
    assert(d.strategy == "shuffle", d)
    assert(sortedRows(joined) ==
      sortedRows(uniform.join(skewed.withColumnRenamed("lv", "rv"), Seq("k"))))
  }

  test("autoSumCount picks salted only under measured skew; results identical either way") {
    val (salted, ds) = JoinPlanner.autoSumCount(skewed, Seq("k"), "lv", skewFraction = 0.2)
    assert(ds.strategy == "salted-agg", ds)
    val (plain, dp) = JoinPlanner.autoSumCount(uniform, Seq("k"), "lv", skewFraction = 0.2)
    assert(dp.strategy == "plain-agg", dp)
    // both branches equal a direct groupBy on their input
    def direct(df: DataFrame) = sortedRows(
      df.groupBy("k").agg(sum("lv").as("sum_lv"), count(lit(1)).as("cnt")))
    assert(sortedRows(salted) == direct(skewed))
    assert(sortedRows(plain) == direct(uniform))
  }

  // composite-key fixtures: hot TUPLE (7, "x") holds half the skewed side
  private lazy val skewed2 =
    ((1 to 3000).map(_ => (7L, "x", 1L)) ++
      (1 to 3000).map(i => (i % 300L + 100L, if (i % 2 == 0) "x" else "y", 2L)))
      .toDF("k1", "k2", "lv")
  private lazy val dim2 = (for (k1 <- 0L to 39L; k2 <- Seq("x", "y"))
    yield (k1, k2, s"d$k1$k2")).toDF("k1", "k2", "name")
  private lazy val midDim2 = (for (k1 <- 0L to 449L; k2 <- Seq("x", "y"))
    yield (k1, k2, s"m$k1$k2")).toDF("k1", "k2", "name")

  test("composite keys: gatherStats finds the hot tuple; tuple parts stay distinct") {
    val s = JoinPlanner.gatherStats(skewed2, Seq("k1", "k2"))
    assert(s.rows == 6000)
    assert(s.topKey.contains("7\u0001x"))
    assert(s.maybeSkewed(0.2))
    // ("ab","c") and ("a","bc") must not fold into one stats key
    val tricky = Seq(("ab", "c"), ("ab", "c"), ("a", "bc")).toDF("k1", "k2")
    val t = JoinPlanner.gatherStats(tricky, Seq("k1", "k2"))
    assert(t.topKey.contains("ab\u0001c") && t.topKeyRows == 2)
  }

  test("composite keys: every autoJoin branch returns exactly the plain join's rows") {
    // broadcast branch
    val (b, db) = JoinPlanner.autoJoin(skewed2, dim2, Seq("k1", "k2"), broadcastMaxRows = 100)
    assert(db.strategy == "broadcast-right", db)
    assert(sortedRows(b) == sortedRows(skewed2.join(dim2, Seq("k1", "k2"))))
    // salted branch: the hot composite tuple spreads, rows identical
    val (sj, dsj) = JoinPlanner.autoJoin(
      skewed2, midDim2, Seq("k1", "k2"), broadcastMaxRows = 100, skewFraction = 0.2,
      saltBuckets = 8, replicateMaxRows = 10000)
    assert(dsj.strategy == "salted", dsj)
    assert(sortedRows(sj) == sortedRows(skewed2.join(midDim2, Seq("k1", "k2"))))
    // shuffle branch
    val (pj, dpj) = JoinPlanner.autoJoin(
      skewed2, midDim2, Seq("k1", "k2"), broadcastMaxRows = 100, skewFraction = 0.9,
      replicateMaxRows = 100)
    assert(dpj.strategy == "shuffle", dpj)
    assert(sortedRows(pj) == sortedRows(skewed2.join(midDim2, Seq("k1", "k2"))))
  }

  test("composite keys: autoSumCount salts the hot tuple; results equal the direct groupBy") {
    val (salted, d) = JoinPlanner.autoSumCount(skewed2, Seq("k1", "k2"), "lv")
    assert(d.strategy == "salted-agg", d)
    val direct = skewed2.groupBy("k1", "k2")
      .agg(sum("lv").as("sum_lv"), count(lit(1)).as("cnt"))
    assert(sortedRows(salted) == sortedRows(direct))
  }

  test("pre-collected stats skip measurement and drive the same decision") {
    val ls = JoinPlanner.SideStats(rows = 5000000L, topKey = None, topKeyRows = 0L, k = 32)
    val rs = JoinPlanner.SideStats(rows = 40L, topKey = None, topKeyRows = 0L, k = 32)
    val (_, d) = JoinPlanner.autoJoin(
      uniform, dim, Seq("k"), leftStats = Some(ls), rightStats = Some(rs))
    assert(d.strategy == "broadcast-right")
  }

  test("gatherStatsMulti: one scan yields per-key-set stats equal to separate passes") {
    // fact with two key columns: k skewed on 7, k2 uniform
    val fact = ((1 to 3000).map(i => (7L, i % 100L, 1L)) ++
      (1 to 3000).map(i => (i % 300L + 100L, i % 100L, 2L))).toDF("k", "k2", "lv")
    val multi = JoinPlanner.gatherStatsMulti(fact, Seq(Seq("k"), Seq("k2"), Seq("k", "k2")))
    val single = Seq(Seq("k"), Seq("k2"), Seq("k", "k2")).map(JoinPlanner.gatherStats(fact, _))
    multi.zip(single).foreach { case (m, s) =>
      assert(m.rows == s.rows && m.topKey == s.topKey && m.topKeyRows == s.topKeyRows,
        s"multi=$m single=$s")
    }
    assert(multi(0).maybeSkewed(0.2) && !multi(1).maybeSkewed(0.2))
  }

  test("autoStarJoin: broadcasts first, sizes the rest ascending, salts the hot key; rows exact") {
    // skewed fact key `k` (hot 7) against mid dim; uniform `k2` against a
    // big dim; tiny dim on `k3` broadcasts
    val fact = ((1 to 3000).map(i => (7L, i % 600L, i % 40L, 1L)) ++
      (1 to 3000).map(i => (i % 300L + 100L, i % 600L, i % 40L, 2L)))
      .toDF("k", "k2", "k3", "lv")
    val bigDim = (0L to 599L).map(j => (j, s"b$j")).toDF("k2", "b")
    val tiny = (0L to 39L).map(j => (j, s"t$j")).toDF("k3", "t")
    val mid = (0L to 449L).map(j => (j, s"m$j")).toDF("k", "m")
    val (joined, ds) = JoinPlanner.autoStarJoin(
      fact,
      Seq((bigDim, Seq("k2")), (tiny, Seq("k3")), (mid, Seq("k"))),
      broadcastMaxRows = 100L, skewFraction = 0.2,
      saltBuckets = 4, replicateMaxRows = 500L)
    assert(ds.map(_.strategy) == Seq("broadcast", "salted", "shuffle"),
      s"expected tiny->broadcast, mid(450)->salted before bigDim(600)->shuffle: $ds")
    val plain = fact.join(bigDim, "k2").join(tiny, "k3").join(mid, "k")
    assert(sortedRows(joined.select("k", "k2", "k3", "lv", "b", "t", "m")) ==
      sortedRows(plain.select("k", "k2", "k3", "lv", "b", "t", "m")))
  }

  test("autoStarJoin with every dim replicable joins the fact entirely pre-shuffle") {
    val fact = (1 to 2000).map(i => (i % 40L, i % 30L, i.toLong)).toDF("a", "b", "lv")
    val da = (0L to 39L).map(j => (j, s"a$j")).toDF("a", "na")
    val db = (0L to 29L).map(j => (j, s"b$j")).toDF("b", "nb")
    val (joined, ds) = JoinPlanner.autoStarJoin(fact, Seq((da, Seq("a")), (db, Seq("b"))))
    assert(ds.forall(_.strategy == "broadcast"))
    assert(hasBroadcast(joined))
    assert(joined.count() == 2000)
  }

  test("manifestStats reads row counts from the manifest, no data scan, skew-conservative") {
    val root = java.nio.file.Files.createTempDirectory("jp_manifest").toString
    val dim = (0L to 99L).map(j => (j, s"d$j")).toDF("k", "nm")
    val fact = (1 to 5000).map(i => (i % 100L, i.toLong)).toDF("k", "v")
    graft.io.VersionedTable.commitAppend(dim, s"$root/dim")
    graft.io.VersionedTable.commitAppend(fact, s"$root/fact")
    val ds = JoinPlanner.manifestStats(spark, s"$root/dim")
    val fs = JoinPlanner.manifestStats(spark, s"$root/fact")
    assert(ds.rows == 100L && fs.rows == 5000L)
    // no key summary in the manifest => never claims skew, whatever the fraction
    assert(!fs.maybeSkewed(0.0001))
    val (joined, decision) = JoinPlanner.autoJoin(
      graft.io.VersionedTable.read(spark, s"$root/fact"),
      graft.io.VersionedTable.read(spark, s"$root/dim"),
      Seq("k"), broadcastMaxRows = 1000L,
      leftStats = Some(fs), rightStats = Some(ds))
    assert(decision.strategy == "broadcast-right", decision.toString)
    assert(joined.count() == 5000)
    graft.queries.Scratch.rmTree(new java.io.File(root))
  }
}
