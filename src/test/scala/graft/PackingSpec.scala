package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Packing

/** Sequence packing (`Packing.packConcat` / `packBins`): hand-computed
  * chunk maps and bins on constructed corpora, plus corpus-wide
  * conservation/utilization properties on the fixture documents table. */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // doc text with exactly n unique tokens
  private def doc(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("packConcat: hand-computed chunk map, straddling doc split at the boundary") {
    val df = Seq(
      ("s", 1L, doc(3, "a")), // cum [0,3)
      ("s", 2L, doc(4, "b")), // cum [3,7)  straddles the 5-boundary
      ("s", 3L, doc(5, "c")), // cum [7,12) straddles the 10-boundary
      ("t", 9L, doc(2, "d")) // separate shard packs independently
    ).toDF("src", "id", "text")
    val got = Packing.packConcat(df, "text", "id", "src", 5)
      .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(
      ("s", 1L, 0L, 0L, 3L, 0L), // whole doc 1 at seq 0 offset 0
      ("s", 2L, 0L, 0L, 2L, 3L), // doc 2 tokens [0,2) finish seq 0
      ("s", 2L, 1L, 2L, 4L, 0L), // doc 2 tokens [2,4) open seq 1
      ("s", 3L, 1L, 0L, 3L, 2L), // doc 3 tokens [0,3) finish seq 1
      ("s", 3L, 2L, 3L, 5L, 0L), // doc 3 tokens [3,5) open seq 2
      ("t", 9L, 0L, 0L, 2L, 0L)))
  }

  test("packConcat conservation on the fixture corpus: every token placed exactly once, no overlap") {
    val docs = Tables.documents(spark, sf)
    val cap = 64
    val m = Packing.packConcat(docs, "text", "doc_id", "source", cap)
    // per-document: chunk slices tile [0, n_tok) without gap or overlap
    val perDoc = m.groupBy("source", "doc_id")
      .agg(sum(col("tok_end") - col("tok_begin")).as("placed"),
        min("tok_begin").as("first"), max("tok_end").as("last"),
        count(lit(1)).as("chunks"))
    val joined = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .join(perDoc, "doc_id")
    assert(joined.filter(col("placed") =!= col("n_tok") ||
      col("first") =!= 0L || col("last") =!= col("n_tok")).count() == 0)
    // per-sequence: every sequence is exactly full except each shard's last
    val perSeq = m.groupBy("source", "seq_id")
      .agg(sum(col("tok_end") - col("tok_begin")).as("filled"))
    val lastSeq = perSeq.groupBy("source").agg(max("seq_id").as("last_seq"))
    val short = perSeq.join(lastSeq, "source")
      .filter(col("seq_id") < col("last_seq") && col("filled") =!= cap)
    assert(short.count() == 0, "only a shard's final sequence may be short")
  }

  test("packBins: hand-computed next-fit bins; oversized doc sits alone") {
    val df = Seq(
      ("s", 1L, doc(3, "a")), // bin 0, offset 0
      ("s", 2L, doc(2, "b")), // bin 0, offset 3 (fits exactly)
      ("s", 3L, doc(1, "c")), // bin 1 (overflow), offset 0
      ("s", 4L, doc(8, "d")), // oversized: own bin 2
      ("s", 5L, doc(2, "e")) // bin 3 (can't join an over-full bin)
    ).toDF("src", "id", "text")
    val got = Packing.packBins(df, "text", "id", "src", 5)
      .collect().sortBy(_.doc_id)
      .map(p => (p.doc_id, p.bin, p.bin_offset)).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 3L), (3L, 1L, 0L), (4L, 2L, 0L), (5L, 3L, 0L)))
  }

  test("packBins properties on the fixture corpus: capacity, contiguity, next-fit utilization bound") {
    val docs = Tables.documents(spark, sf)
    val cap = 64
    val packed = Packing.packBins(docs, "text", "doc_id", "source", cap).cache()
    // every doc exactly once
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // a bin never exceeds capacity unless it is a single oversized doc
    val bins = packed.groupBy("shard", "bin")
      .agg(sum("n_tok").as("fill"), count(lit(1)).as("docs"))
    assert(bins.filter(col("fill") > cap && col("docs") > 1).count() == 0)
    // bin_offset is the running fill: offset = sum of earlier docs in bin
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "bin").orderBy("doc_id")
    val bad = packed.withColumn(
      "expect", coalesce(sum("n_tok").over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter(col("bin_offset") =!= col("expect"))
    assert(bad.count() == 0)
    // next-fit guarantee per shard: adjacent bins sum past capacity, so
    // bins < 2 * total/cap + 1
    val byShard = packed.groupBy("shard")
      .agg(sum("n_tok").as("total"), (max("bin") + 1).as("nbins"))
      .as[(String, Long, Long)].collect()
    byShard.foreach { case (s, total, nbins) =>
      assert(nbins <= 2 * total / cap + 1, s"shard $s: $nbins bins for $total tokens")
    }
    packed.unpersist()
  }

  test("packSequences: tokens in order, segments flip per doc, positions continue across a straddle") {
    val df = Seq(
      ("s", 1L, doc(3, "a")), // seq 0: a0 a1 a2 | b0 b1 ; seq 1: b2 b3 | c0 c1 c2 ; seq 2: c3 c4
      ("s", 2L, doc(4, "b")),
      ("s", 3L, doc(5, "c"))
    ).toDF("src", "id", "text")
    val got = Packing.packSequences(df, "text", "id", "src", 5)
      .orderBy("seq_id")
      .select("seq_id", "n_docs", "n_tokens", "tokens", "segment_ids", "position_ids")
      .as[(Long, Int, Int, Seq[String], Seq[Int], Seq[Int])].collect().toSeq
    assert(got == Seq(
      (0L, 2, 5, Seq("a0", "a1", "a2", "b0", "b1"), Seq(1, 1, 1, 2, 2), Seq(0, 1, 2, 0, 1)),
      // doc 2's continuation keeps counting positions (2, 3) — the
      // document-relative convention a straddle needs
      (1L, 2, 5, Seq("b2", "b3", "c0", "c1", "c2"), Seq(1, 1, 2, 2, 2), Seq(2, 3, 0, 1, 2)),
      (2L, 1, 2, Seq("c3", "c4"), Seq(1, 1), Seq(3, 4))))
  }

  test("packing is deterministic across runs") {
    val docs = Tables.documents(spark, sf)
    def one(): Seq[Packing.PackedDoc] =
      Packing.packBins(docs, "text", "doc_id", "source", 64).collect().sortBy(_.doc_id).toSeq
    assert(one() == one())
  }
}
