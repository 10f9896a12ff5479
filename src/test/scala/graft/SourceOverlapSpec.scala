package graft

import graft.ops.SourceOverlap

/** Cross-source shingle overlap ([[SourceOverlap.shingleOverlap]]):
  * hand-counted shared shingles, the ubiquitous-shingle cap, and
  * within-source duplicates not inflating counts. */
class SourceOverlapSpec extends SparkSuite {
  import spark.implicits._

  test("hand-counted shared 2-shingles between three sources") {
    val df = Seq(
      ("a", "w x y z"), // shingles: "w x","x y","y z"
      ("b", "x y z q"), // shingles: "x y","y z","z q"  → a∩b = 2
      ("c", "p q r s") //            "p q","q r","r s" → no overlap
    ).toDF("source", "text")
    val got = SourceOverlap.shingleOverlap(df, "text", "source", shingleLen = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L)))
  }

  test("duplicate shingles WITHIN a source count once") {
    val df = Seq(
      ("a", "k k k k"), // "k k" ×3 → one distinct shingle
      ("b", "k k m")
    ).toDF("source", "text")
    val got = SourceOverlap.shingleOverlap(df, "text", "source", shingleLen = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L)))
  }

  test("maxSources cap drops boilerplate shingles before pair expansion") {
    val df = Seq(
      ("a", "common phrase here"), ("b", "common phrase here"),
      ("c", "common phrase here"), ("a", "rare pair only"), ("b", "rare pair only")
    ).toDF("source", "text")
    // the 3-source shingles are dropped at cap 2; the 2-source ones survive
    val got = SourceOverlap
      .shingleOverlap(df, "text", "source", shingleLen = 3, maxSources = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L)))
  }

  test("short documents (fewer tokens than the shingle) are ignored") {
    val df = Seq(("a", "one two"), ("b", "one two")).toDF("source", "text")
    assert(SourceOverlap.shingleOverlap(df, "text", "source", shingleLen = 4).count() == 0)
  }
}
