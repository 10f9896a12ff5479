package graft

import org.apache.spark.sql.functions._

import graft.ops.DiverseTopK

/** [[DiverseTopK]] — MMR greedy selection: relevance wins at high λ,
  * diversity wins at low λ, ties break on id, and the loop is
  * deterministic and layout-proof. */
class DiverseTopKSpec extends SparkSuite {
  import spark.implicits._

  // probe = [1,0,0]: a is the perfect hit, b is a highly relevant
  // near-duplicate of a, c is orthogonal (zero relevance, full diversity)
  private val corpus = Seq(
    (1L, Seq(1.0, 0.0, 0.0), 1.0), // a
    (2L, Seq(0.8, 0.6, 0.0), 0.8), // b: cos(b, a) = 0.8
    (3L, Seq(0.0, 1.0, 0.0), 0.0)  // c: cos(c, a) = 0
  )

  private def df = corpus.toDF("vec_id", "emb", "rel")

  test("high lambda prefers the relevant near-duplicate; low lambda the diverse pick") {
    assert(DiverseTopK.mmr(df, "vec_id", "emb", "rel", k = 2, lambda = 0.7) ==
      Seq(1L, 2L)) // 0.7·0.8 − 0.3·0.8 = 0.32 beats c's 0
    assert(DiverseTopK.mmr(df, "vec_id", "emb", "rel", k = 2, lambda = 0.3) ==
      Seq(1L, 3L)) // b scores 0.3·0.8 − 0.7·0.8 = −0.32, c scores 0
  }

  test("k beyond the corpus returns everything once; order is deterministic") {
    val all = DiverseTopK.mmr(df, "vec_id", "emb", "rel", k = 10, lambda = 0.5)
    assert(all.toSet == Set(1L, 2L, 3L) && all.size == 3)
    assert(DiverseTopK.mmr(df.repartition(5), "vec_id", "emb", "rel", 10, 0.5) == all)
  }

  test("shortlist >= corpus size reproduces the exact selection") {
    // 60-vector corpus with clustered directions so diversity matters
    val big = (0L until 60L).map { i =>
      val angle = (i % 6) * 0.5
      (i, Seq(math.cos(angle), math.sin(angle)), 1.0 - i * 0.01)
    }.toDF("vec_id", "emb", "rel")
    for (lam <- Seq(0.3, 0.7)) {
      val exact = DiverseTopK.mmr(big, "vec_id", "emb", "rel", k = 8, lambda = lam)
      assert(DiverseTopK.mmr(
        big, "vec_id", "emb", "rel", k = 8, lambda = lam, shortlist = 60) == exact)
      assert(DiverseTopK.mmr(
        big, "vec_id", "emb", "rel", k = 8, lambda = lam, shortlist = 500) == exact)
    }
    // a shortlist below k is a contract violation, not a silent truncation
    intercept[IllegalArgumentException](
      DiverseTopK.mmr(big, "vec_id", "emb", "rel", k = 8, shortlist = 4))
    // bounded pool: selection comes from the relevance top-N only
    val pooled = DiverseTopK.mmr(
      big, "vec_id", "emb", "rel", k = 3, lambda = 1.0, shortlist = 10)
    assert(pooled.forall(_ < 10L), pooled.toString)
  }

  test("score ties break on the lower id") {
    val tied = Seq(
      (7L, Seq(1.0, 0.0), 0.5),
      (5L, Seq(0.0, 1.0), 0.5)).toDF("vec_id", "emb", "rel")
    assert(DiverseTopK.mmr(tied, "vec_id", "emb", "rel", 1, 1.0) == Seq(5L))
  }
}
