package graft

import graft.ops.Triangles

/** Triangle counting ([[graft.ops.Triangles]]): known closed-form graphs
  * pin exact counts; duplicate/reversed/self-loop edges must not inflate
  * them; a hub star stays triangle-free. */
class TrianglesSpec extends SparkSuite {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  test("K4 has 4 triangles; C5 has none; star hub has none") {
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(Triangles.count(k4) == 4L)
    val c5 = edges((1, 2), (2, 3), (3, 4), (4, 5), (5, 1))
    assert(Triangles.count(c5) == 0L)
    val star = edges((0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6))
    assert(Triangles.count(star) == 0L)
  }

  test("duplicate, reversed, and self-loop edges do not change the count") {
    val tri = edges((1, 2), (2, 3), (1, 3))
    assert(Triangles.count(tri) == 1L)
    val noisy = edges((1, 2), (2, 1), (2, 3), (2, 3), (1, 3), (1, 1), (3, 3))
    assert(Triangles.count(noisy) == 1L)
  }

  test("two triangles sharing an edge; perNode attributes participation correctly") {
    // 1-2-3 and 2-3-4: nodes 2,3 are in both
    val g = edges((1, 2), (1, 3), (2, 3), (2, 4), (3, 4))
    assert(Triangles.count(g) == 2L)
    val byNode = Triangles.perNode(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byNode == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), byNode.toString)
  }

  test("perNode total is 3x the triangle count (every triangle has 3 corners)") {
    val k5 = edges((for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)): _*)
    assert(Triangles.count(k5) == 10L)
    val sum = Triangles.perNode(k5).collect().map(_.getLong(1)).sum
    assert(sum == 30L)
  }
}
