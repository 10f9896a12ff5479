package graft

import graft.ops.JoinCard

/** Join-cardinality estimation ([[JoinCard]]): exactness when the heavy
  * summary covers the whole key space, the uniform model on flat data,
  * and the skew case a uniform estimator misses by orders of magnitude. */
class JoinCardSpec extends SparkSuite {

  import spark.implicits._

  private def trueJoinRows(a: Seq[Long], b: Seq[Long]): Long = {
    val bc = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    a.map(k => bc.getOrElse(k, 0L)).sum
  }

  test("exact when both summaries cover every key") {
    val a = Seq(1L, 1L, 1L, 2L, 2L, 3L)
    val b = Seq(1L, 2L, 2L, 2L, 4L)
    val (est, _, _) = JoinCard.estimateJoin(
      a.toDF("k"), b.toDF("k"), Seq("k"), k = 64)
    assert(est == trueJoinRows(a, b).toDouble) // 3*1 + 2*3 = 9
  }

  test("uniform keys reproduce the System R estimate within sketch noise") {
    val a = (0L until 2000L).map(_ % 100) // 100 keys x 20 rows
    val b = (0L until 1000L).map(_ % 100) // 100 keys x 10 rows
    val (est, _, _) = JoinCard.estimateJoin(
      a.toDF("k"), b.toDF("k"), Seq("k"), k = 8)
    val truth = trueJoinRows(a, b).toDouble // 100 * 20 * 10 = 20000
    assert(est > truth * 0.5 && est < truth * 2.0, s"est=$est truth=$truth")
  }

  test("a shared hot key dominates and the estimate tracks it") {
    // key 0 holds half of each side: truth ~ 1000*500 >> uniform model
    val a = Seq.fill(1000)(0L) ++ (1L to 1000L)
    val b = Seq.fill(500)(0L) ++ (1L to 500L)
    val truth = trueJoinRows(a, b).toDouble // 500000 + 500
    val (est, ls, rs) = JoinCard.estimateJoin(
      a.toDF("k"), b.toDF("k"), Seq("k"), k = 16)
    assert(ls.heavy.contains("0") && rs.heavy.contains("0"))
    assert(est > truth * 0.5 && est < truth * 2.0, s"est=$est truth=$truth")
    // the no-histogram uniform model would claim ~ n_a*n_b/max(d) ~ 3000:
    // two orders of magnitude off; the summary-based estimate must not be
    val uniform = a.size.toDouble * b.size.toDouble / 1001.0
    assert(est > uniform * 10, s"est=$est degenerated to uniform=$uniform")
  }

  test("empty side estimates zero") {
    val (est, _, _) = JoinCard.estimateJoin(
      Seq.empty[Long].toDF("k"), Seq(1L, 2L).toDF("k"), Seq("k"))
    assert(est == 0.0)
  }

  test("guardedJoin passes bounded joins and refuses explosive ones by name") {
    val a = (Seq.fill(1000)(0L) ++ (1L to 100L)).toDF("k")
    val b = (Seq.fill(1000)(0L) ++ (1L to 100L)).toDF("k")
    // hot key 0 alone produces ~10^6 rows
    val e = intercept[IllegalStateException] {
      graft.ops.JoinCard.guardedJoin(a, b, Seq("k"), maxRows = 1e5)
    }
    assert(e.getMessage.contains("hot key '0'"), e.getMessage)
    val (joined, est) = graft.ops.JoinCard.guardedJoin(a, b, Seq("k"), maxRows = 1e7)
    assert(est > 1e5)
    assert(joined.count() == 1000L * 1000 + 100)
  }

  test("composite keys summarize the tuple, not the columns") {
    val a = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("k1", "k2")
    val b = Seq((1L, "x"), (2L, "y")).toDF("k1", "k2")
    val (est, _, _) = JoinCard.estimateJoin(a, b, Seq("k1", "k2"), k = 64)
    assert(est == 1.0) // only (1,x) matches
  }
}
