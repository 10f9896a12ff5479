package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Span-level exact-substring dedup (`Dedup.repeatedSpans` /
  * `stripRepeatedSpans`): constructed corpora with hand-computed expected
  * spans, keeper election, within-doc repeats, interval merging, the
  * hash-vs-exact gram key equivalence, and strip semantics. */
class RepeatedSpanSpec extends SparkSuite {
  import spark.implicits._

  // filler tokens are all unique across the corpus, so ONLY the planted
  // phrase can form a repeated 4-gram
  private val phrase = "alpha beta gamma delta epsilon zeta" // 6 tokens
  private def corpus(): DataFrame = Seq(
    (1L, s"u01 u02 $phrase u03 u04"), // phrase at pos 2..7
    (2L, s"v01 v02 v03 v04 v05 $phrase"), // phrase at pos 5..10
    (3L, "w01 w02 w03 w04 w05 w06 w07 w08")
  ).toDF("doc_id", "text")

  private def spansOf(df: DataFrame, k: Int, hash: Boolean): Seq[(Long, Long, Long)] =
    Dedup.repeatedSpans(df, "text", "doc_id", k, hashGrams = hash)
      .as[(Long, Long, Long)].collect().sorted.toSeq

  test("cross-doc repeat: keeper survives, the other occurrence becomes one merged span") {
    // three overlapping 4-grams of the phrase all repeat; doc 1 holds the
    // least (doc, pos) occurrences so doc 2's copy is the span
    assert(spansOf(corpus(), 4, hash = true) == Seq((2L, 5L, 11L)))
    assert(spansOf(corpus(), 4, hash = false) == Seq((2L, 5L, 11L)))
  }

  test("within-doc repeat flags the later occurrence; k bounds what counts as a repeat") {
    val df = Seq(
      (7L, s"$phrase x01 x02 x03 $phrase") // positions 0..5 and 9..14
    ).toDF("doc_id", "text")
    assert(spansOf(df, 4, hash = true) == Seq((7L, 9L, 15L)))
    // k = 7 > phrase length: nothing repeats at that granularity
    assert(spansOf(df, 7, hash = true).isEmpty)
  }

  test("adjacent and overlapping flagged windows merge into maximal spans") {
    // two docs share TWO phrases back to back in doc 9 — the flagged
    // positions are contiguous and must merge into one span
    val df = Seq(
      (8L, s"a01 $phrase a02 a03 a04 a05 a06 a07"),
      (9L, s"b01 b02 $phrase $phrase"),
      (10L, "c01 c02 c03 c04 c05 c06")
    ).toDF("doc_id", "text")
    val spans = spansOf(df, 4, hash = true)
    // doc 9 holds both later occurrences: one merged span of 12 tokens
    assert(spans == Seq((9L, 2L, 14L)), s"got $spans")
  }

  test("strip keeps the keeper copy and rewrites only spanned docs") {
    val out = Dedup.stripRepeatedSpans(corpus(), "text", "doc_id", 4)
      .select("doc_id", "cleaned", "spans_removed")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, s"u01 u02 $phrase u03 u04", 0))) // keeper doc intact
    assert(out(1) == ((2L, "v01 v02 v03 v04 v05", 1))) // phrase stripped
    assert(out(2) == ((3L, "w01 w02 w03 w04 w05 w06 w07 w08", 0)))
  }

  test("hash and exact gram keys produce identical spans on the real corpus") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val h = spansOf(docs, 8, hash = true)
    val e = spansOf(docs, 8, hash = false)
    assert(h == e, s"hash path diverged: ${h.size} vs ${e.size} spans")
    // structural properties: spans are >= k tokens, per-doc non-overlapping
    assert(h.forall { case (_, s, e2) => e2 - s >= 8 })
    h.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) => assert(e1 < s2, "overlapping spans")
        case _ =>
      }
    }
  }
}
