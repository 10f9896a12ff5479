package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Bpe

/** Distributed BPE vocabulary induction (`ops.Bpe`): exact agreement with
  * an independent in-memory reference implementation (same tie-break and
  * greedy-apply semantics), hand-checked first merge, segmentation
  * conservation, early stop, determinism. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference: plain Scala collections, no Spark. */
  private def refTrain(
      corpus: Seq[String], numMerges: Int, minFreq: Long): Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w.split("").toList -> ws.size.toLong }
    def applyMerge(s: List[String], a: String, b: String): List[String] =
      s.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 0 until numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) += f)
      }
      val ranked = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }
      if (ranked.isEmpty || ranked.head._2 < minFreq) return out.toSeq
      val ((a, b), n) = ranked.head
      out += ((a, b, n))
      words = words.map { case (syms, f) => applyMerge(syms, a, b) -> f }
    }
    out.toSeq
  }

  private val classic = Seq(
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest newest widest",
    "widest widest")

  test("first merge is the hand-checked argmax with lexicographic tie-break") {
    val rules = Bpe.train(classic.toDF("text"), "text", 1)
    // (e,s) and (s,t) both occur 10 times (newest x7 + widest x3); the
    // tie breaks to the lexicographically smaller left symbol
    assert(rules.map(r => (r.left, r.right, r.freq)) == Seq(("e", "s", 10L)))
  }

  test("ten merges agree exactly with the reference implementation") {
    val got = Bpe.train(classic.toDF("text"), "text", 10)
      .map(r => (r.left, r.right, r.freq))
    assert(got == refTrain(classic, 10, 2L))
  }

  test("agreement holds on the fixture corpus too") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.select("text").as[String].collect().toSeq
    val got = Bpe.train(docs, "text", 8).map(r => (r.left, r.right, r.freq))
    assert(got == refTrain(corpus, 8, 2L))
    assert(got.size == 8 && got.distinct.size == 8)
  }

  test("segmentation conserves every character and applies merges greedily") {
    val rules = Bpe.train(classic.toDF("text"), "text", 10)
    val seg = Bpe.segment(classic.toDF("text"), "text", rules)
    // conservation: concatenating the BPE tokens reproduces the text
    // minus spaces, for every row
    val bad = seg.filter(
      concat_ws("", col("bpe_tokens")) =!= regexp_replace(col("text"), " ", ""))
    assert(bad.count() == 0)
    // the most frequent word fuses completely after enough merges
    val newest = Bpe.segment(Seq("newest").toDF("text"), "text", rules)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(newest.length < "newest".length, s"expected fused segments, got $newest")
  }

  test("decode inverts segmentWords exactly on the fixture corpus (lossless round-trip)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rules = Bpe.train(docs, "text", 12)
    val rt = Bpe.segmentWords(docs, "text", rules)
      .select(
        col("doc_id"),
        Bpe.decode(col("bpe_words")).as("decoded"),
        concat_ws(" ", graft.functions.TextFunctions.tokens(col("text"))).as("norm"))
    assert(rt.filter(col("decoded") =!= col("norm")).count() == 0,
      "decode(segmentWords(text)) must equal the whitespace-normalized text")
    assert(rt.count() == docs.count())
  }

  test("encodeDistinct agrees row-for-row with the direct segment fold") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rules = Bpe.train(docs, "text", 8)
    val viaDistinct = Bpe.encodeDistinct(docs, "text", "doc_id", rules)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    val viaSegment = Bpe.segment(docs, "text", rules)
      .select(col("doc_id"), size(col("bpe_tokens")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(viaDistinct == viaSegment)
    assert(viaDistinct.nonEmpty)
    // merges strictly compress: BPE token count < character count somewhere,
    // and never exceeds the per-word character total
    val chars = docs
      .select(col("doc_id"), expr("cast(length(replace(text, ' ', '')) as bigint)"))
      .as[(Long, Long)].collect().toMap
    assert(viaDistinct.forall { case (id, n) => n <= chars(id) })
    assert(viaDistinct.exists { case (id, n) => n < chars(id) })
  }

  test("early stop below minPairFreq and run-to-run determinism") {
    val rules = Bpe.train(classic.toDF("text"), "text", 50, minPairFreq = 8L)
    assert(rules.nonEmpty && rules.last.freq >= 8L && rules.size < 50)
    val again = Bpe.train(classic.toDF("text"), "text", 10)
    assert(again.map(r => (r.left, r.right, r.freq)) ==
      Bpe.train(classic.toDF("text"), "text", 10).map(r => (r.left, r.right, r.freq)))
  }
}
