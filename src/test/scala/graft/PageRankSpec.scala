package graft

import org.apache.spark.sql.functions._

import graft.ops.PageRank

/** PageRank contract: hand-checkable chain, brute-force equality on a
  * pseudo-random graph (dangling nodes included), duplicate-edge
  * collapse, and the ranking property curation relies on. */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => r(u) / out(u) }.sum
      }
      r = nodes.map(v => v -> ((1 - d) + d * inflow.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] =
    PageRank.rank(edges.toDF("src", "dst"), d, iters)
      .as[(Long, Double)].collect().toMap

  test("two-node chain matches the recurrence by hand") {
    // 1 -> 2: r1 stays at 0.15 from round 1 on; r2 = 0.15 + 0.85*r1(prev)
    val got = run(Seq((1L, 2L)), 0.85, 3)
    assert(math.abs(got(1L) - 0.15) < 1e-12)
    assert(math.abs(got(2L) - (0.15 + 0.85 * 0.15)) < 1e-12)
  }

  test("pseudo-random graph with dangling nodes matches brute force") {
    val edges = (0 until 200)
      .map(i => ((i * 7 % 50).toLong, (i * 13 + 3) % 50 + 25L))
      .filter { case (a, b) => a != b }
    val expected = brute(edges, 0.85, 5)
    val got = run(edges, 0.85, 5)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, r) =>
      assert(math.abs(got(id) - r) < 1e-9, s"node $id: got ${got(id)} expected $r")
    }
  }

  test("duplicate edges collapse before out-degree is computed") {
    val got = run(Seq((1L, 2L), (1L, 2L), (1L, 3L)), 0.85, 2)
    val exp = brute(Seq((1L, 2L), (1L, 3L)), 0.85, 2)
    exp.foreach { case (id, r) => assert(math.abs(got(id) - r) < 1e-12) }
  }

  test("a heavily linked-to hub outranks leaf nodes (the curation property)") {
    val star = (1L to 20L).map(i => (i, 100L))
    val got = run(star, 0.85, 5)
    assert(got(100L) > got(1L) * 10,
      s"hub must dominate: hub=${got(100L)} leaf=${got(1L)}")
  }
}
