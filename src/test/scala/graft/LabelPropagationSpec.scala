package graft

import graft.ops.LabelPropagation

/** Synchronous label propagation ([[LabelPropagation]]): convergence on
  * canonical shapes, the self-vote oscillation fix, determinism, and the
  * bridge-splitting behavior that distinguishes it from connected
  * components. */
class LabelPropagationSpec extends SparkSuite {

  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("an isolated edge settles to the smaller id (no sync oscillation)") {
    // without the self-vote, synchronous LPA swaps {7,9} forever
    assert(labelsOf(Seq((7L, 9L))) == Map(7L -> 7L, 9L -> 7L))
    assert(labelsOf(Seq((7L, 9L)), iters = 4) == Map(7L -> 7L, 9L -> 7L))
  }

  test("a clique converges to one label (its minimum id)") {
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = labelsOf(clique)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("two cliques joined by one bridge keep distinct communities") {
    val c1 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c2 = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val got = labelsOf(c1 ++ c2 :+ (4L, 11L))
    // connected components would merge everything into one group; dense
    // neighborhoods out-vote the single bridge edge
    assert((1L to 4L).map(got).toSet.size == 1)
    assert((11L to 14L).map(got).toSet.size == 1)
    assert(got(1L) != got(11L))
  }

  test("a star converges to the hub-anchored minimum label") {
    val got = labelsOf(Seq((5L, 1L), (5L, 2L), (5L, 3L)))
    // round 1: leaves tie (self vs hub) -> min(leaf, 5); hub ties 4-ways -> 1
    // subsequent rounds propagate 1 through the hub
    assert(got.values.toSet == Set(1L))
  }

  test("iters = 0 returns the identity labeling") {
    assert(labelsOf(Seq((1L, 2L), (2L, 3L)), iters = 0) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("self-loops do not crash and keep singleton nodes labeled") {
    val got = labelsOf(Seq((1L, 1L), (2L, 3L)))
    assert(got(2L) == 2L && got(3L) == 2L && got(1L) == 1L)
  }

  test("deterministic across repeated runs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    assert(labelsOf(edges) == labelsOf(edges))
  }
}
