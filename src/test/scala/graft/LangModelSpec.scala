package graft

import org.apache.spark.sql.functions._

import graft.ops.LangModel

/** Unigram LM contract: hand-computed probabilities on a tiny corpus,
  * smoothing floor for unseen tokens, and the ranking property the
  * quality filter relies on. */
class LangModelSpec extends SparkSuite {
  import spark.implicits._

  // corpus: a:3, b:1, c:1 -> N=5, V=3; add-one: p(a)=4/8, p(b)=p(c)=2/8
  private lazy val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
  private lazy val vocab = LangModel.unigramCounts(docs)

  test("scores match hand-computed add-one smoothed log-probabilities") {
    val got = LangModel.scoreDocs(docs, vocab)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val pA = math.log(4.0 / 8.0); val pBC = math.log(2.0 / 8.0)
    val expected = Seq(
      (1L, 3L, (2 * pA + pBC) / 3.0),
      (2L, 2L, (pA + pBC) / 2.0))
    got.zip(expected).foreach { case ((id, n, lp), (eid, en, elp)) =>
      assert(id == eid && n == en && math.abs(lp - elp) < 1e-12)
    }
  }

  test("unseen tokens under a cross-corpus model take the smoothed floor") {
    val candidate = Seq((9L, "z z")).toDF("doc_id", "text")
    val got = LangModel.scoreDocs(candidate, vocab)
      .as[(Long, Long, Double)].collect().head
    assert(got._1 == 9L && got._2 == 2L)
    assert(math.abs(got._3 - math.log(1.0 / 8.0)) < 1e-12) // (0+1)/(5+3)
  }

  test("documents of frequent tokens outrank rare-token documents (the filter property)") {
    val corpus = (1 to 200).map(i => (i.toLong, "the quick fox " + s"rare$i"))
      .toDF("doc_id", "text")
    val v = LangModel.unigramCounts(corpus)
    val probes = Seq((900L, "the quick fox"), (901L, "rare3 rare7 rare11")).toDF("doc_id", "text")
    val scores = LangModel.scoreDocs(probes, v)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(scores(0)._3 > scores(1)._3,
      s"frequent-token doc must score higher: ${scores.toSeq}")
  }
}
