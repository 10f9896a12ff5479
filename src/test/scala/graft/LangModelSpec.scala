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

  // bigram corpus: "a b" ×2 in doc 10 and ×1 in doc 11 → cnt(a,b)=3;
  // "b c" once → pruned at minCount=2; unigrams a:3, b:3, c:1 (N=7, V=3)
  private lazy val bdocs =
    Seq((10L, "a b a b"), (11L, "a b c")).toDF("doc_id", "text")

  test("bigram counts zip adjacent pairs and prune at minCount") {
    val all = LangModel.bigramCounts(bdocs).orderBy("w1", "w2")
      .as[(String, String, Long)].collect().toSeq
    assert(all == Seq(("a", "b", 3L), ("b", "a", 1L), ("b", "c", 1L)))
    val pruned = LangModel.bigramCounts(bdocs, minCount = 2L)
      .as[(String, String, Long)].collect().toSeq
    assert(pruned == Seq(("a", "b", 3L)), "singletons must prune")
  }

  test("stupid backoff: surviving bigrams score cb/c1, pruned ones alpha*smoothed-unigram") {
    val uni = LangModel.unigramCounts(bdocs)
    val bi = LangModel.bigramCounts(bdocs, minCount = 2L)
    val got = LangModel.scoreDocsBackoff(bdocs, uni, bi, alpha = 0.4)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val sAB = math.log(3.0 / 3.0)             // cnt(a,b)/cnt(a)
    val bo = (w2cnt: Long) => math.log(0.4 * (w2cnt + 1) / (7.0 + 3.0))
    val expected = Seq(
      (10L, 3L, (2 * sAB + bo(3)) / 3.0),     // a-b, b-a(pruned→backoff on a), a-b
      (11L, 2L, (sAB + bo(1)) / 2.0))         // a-b, b-c(pruned→backoff on c)
    got.zip(expected).foreach { case ((id, n, lp), (eid, en, elp)) =>
      assert(id == eid && n == en && math.abs(lp - elp) < 1e-12,
        s"doc $id: got $lp expected $elp")
    }
  }

  test("sub-2-token documents yield no bigram row; empty docs survive the zip") {
    val tiny = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(tiny)
    val got = LangModel.scoreDocsBackoff(tiny, uni, LangModel.bigramCounts(tiny))
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }
}
