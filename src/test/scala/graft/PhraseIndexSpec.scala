package graft

import graft.ops.PhraseIndex

/** Contract of [[PhraseIndex]]: exact phrase hits with 1-based anchors,
  * overlapping occurrences all reported, repeated-term phrases resolved
  * by the distinct-offset count (the DuckDB oracle re-checks q233's
  * aggregate; here the per-occurrence anchors are pinned by hand).
  */
class PhraseIndexSpec extends SparkSuite {

  test("anchors, overlaps, and repeated-term phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"),       // "a b" at 1 and 4
      (2L, "x x x x"),         // "x x x" at 1 and 2 (overlapping)
      (3L, "b a"),             // no "a b"
      (4L, "a")).toDF("doc_id", "text")
    val post = PhraseIndex.postings(docs, "doc_id", "text")

    val ab = PhraseIndex.phraseOccurrences(post, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ab == Set((1L, 1L), (1L, 4L)))

    val xxx = PhraseIndex.phraseOccurrences(post, Seq("x", "x", "x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(xxx == Set((2L, 1L), (2L, 2L)))

    assert(PhraseIndex.phraseOccurrences(post, Seq("c", "c")).count() == 0L)
    // single-token phrase degenerates to the term's postings
    val a1 = PhraseIndex.phraseOccurrences(post, Seq("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a1 == Set((1L, 1L), (1L, 4L), (3L, 2L), (4L, 1L)))
  }
}
