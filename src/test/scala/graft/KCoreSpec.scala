package graft

import graft.ops.KCore

/** [[KCore.kCore]] — hand-peeled graphs (a tail whose removal triggers a
  * SECOND peel round), the all-peeled degenerate case, the within-core
  * degree invariant, and layout determinism. */
class KCoreSpec extends SparkSuite {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int) = {
    val (df, rounds) = KCore.kCore(spark, edges.toDF("a", "b"), k)
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("2-core of a triangle with a pendant chain peels in cascading rounds") {
    // triangle 1-2-3, chain 3-4-5: dropping 5 (deg 1) exposes 4, dropping
    // 4 leaves the triangle — the cascade NEEDS multiple rounds
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val (got, rounds) = core(edges, 2)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(rounds >= 2, s"cascade must take multiple peels, took $rounds")
  }

  test("a k beyond every degree peels everything; k=1 keeps any edge") {
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(core(edges, 3)._1.isEmpty)
    assert(core(edges, 1)._1 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("within-core degrees satisfy the k bound; self-loops and dupes ignored") {
    val edges = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (1L, 4L), (2L, 4L))
    val (got, _) = core(edges, 3)
    assert(got.nonEmpty && got.values.forall(_ >= 3L), got.toString)
    assert(got.keySet == Set(1L, 2L, 3L, 4L)) // the K4 minus nothing
  }

  test("deterministic across layouts") {
    val edges = (1L to 120L).flatMap(i => Seq((i, i % 37), (i, i % 11))).filter(e => e._1 != e._2)
    val (a, _) = KCore.kCore(spark, edges.toDF("a", "b"), 4)
    val (b, _) = KCore.kCore(spark, edges.toDF("a", "b").repartition(13), 4)
    assert(a.collect().sortBy(_.getLong(0)).toSeq == b.collect().sortBy(_.getLong(0)).toSeq)
  }
}
