package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.Dedup
import graft.pipeline.CorpusRefresh

/** The incremental corpus-refresh capstone (VERDICT r16 item 6): CDC →
  * MinHash ledger → IVF append as ONE call, with the keep/drop closure
  * and the ∝-increment work contract asserted, not narrated. The fixture
  * VALIDATES ITS OWN jaccard geometry through the engine's functions
  * before asserting pipeline behavior, so a drifted shingle rule fails
  * loudly here instead of silently weakening the keep/drop assertions. */
@org.scalatest.tags.Slow
class CorpusRefreshSpec extends SparkSuite {
  import spark.implicits._

  // 100-token base text; near-dups perturb single tokens so the 3-shingle
  // jaccard lands where each case needs it (verified below)
  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")
  private def text(ts: Seq[String]): String = ts.mkString(" ")

  private val baseA = toks("a", 100)
  private val fixture = Map(
    // residents (v1)
    1L -> text(baseA),
    2L -> text(toks("b", 100)),
    3L -> text(toks("c", 100)),
    // increment (v2)
    // ONE interior token change flips exactly 3 of ~98 3-shingles
    // (J = 95/101 ≈ 0.941 ≥ 0.9); two DISJOINT interior changes flip 6
    // (J = 92/104 ≈ 0.885 < 0.9) — so 11 anchors to 1, 12 pairs with 11
    // but not with 1 (verified by the geometry test below)
    11L -> text(baseA.updated(30, "zz")), // near-dups resident 1
    12L -> text(baseA.updated(30, "zz").updated(70, "yy")), // near-dups 11, NOT 1
    13L -> text(toks("d", 100)), // == 14 (within-increment dup group)
    14L -> text(toks("d", 100)),
    15L -> text(toks("e", 100))) // unique

  private def docs(ids: Long*) =
    ids.map(i => (i, fixture(i))).toDF("doc_id", "text")

  private def jac(x: Long, y: Long): Double = {
    val d = docs(x, y)
    val sh = d.select(col("doc_id"), graft.functions.ShingleHashSetExpr(
      graft.functions.TextFunctions.tokens(col("text")), 3).as("sh"))
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(graft.functions.TextFunctions.jaccard(col("a.sh"), col("b.sh")))
      .head().getDouble(0)
  }

  test("fixture geometry: the keep/drop cases sit on the right side of 0.9") {
    assert(jac(1L, 11L) >= 0.9, s"11 must anchor to resident 1: ${jac(1L, 11L)}")
    assert(jac(11L, 12L) >= 0.9, s"12 must pair with 11: ${jac(11L, 12L)}")
    assert(jac(1L, 12L) < 0.9, s"12 must NOT pair with 1 directly: ${jac(1L, 12L)}")
    assert(jac(13L, 14L) >= 0.9)
    assert(jac(13L, 15L) < 0.9)
  }

  private def parquetRows(path: String): Long =
    try spark.read.parquet(path).count() catch { case _: Throwable => 0L }

  test("bootstrap → increment → idle: keep/drop closure, ledger growth ∝ increment, IVF append, report") {
    val tmp = java.nio.file.Files.createTempDirectory("refresh").toString
    val table = s"$tmp/corpus"
    val ledger = Dedup.DedupLedger(s"$tmp/bands", s"$tmp/sketches")
    val ivf = s"$tmp/ivf"
    // embeddings: a deterministic 4-dim vector per doc id
    def embs(ids: Long*) = ids.map { i =>
      (i, Array(i.toDouble, (i % 7).toDouble, (i % 3).toDouble, 1.0))
    }.toDF("vec_id", "emb")

    val v1 = VersionedTable.commitAppend(docs(1L, 2L, 3L), table)
    val (r1, s1) = CorpusRefresh.refresh(spark, table, None, ledger,
      ivfPath = Some(ivf), embeddings = Some(embs(1L, 2L, 3L)),
      minJaccard = 0.9, ivfNlist = 2)
    assert(r1.newDocs == 3 && r1.nearDupPairs == 0 && r1.survivors == 3)
    assert(r1.vectorsAppended == 3 && r1.ivfSkew.nonEmpty)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(parquetRows(ledger.sketches) == 3)
    assert(parquetRows(ledger.bands) == 3 * 8) // 8 bands per doc

    val v2 = VersionedTable.commitAppend(docs(11L, 12L, 13L, 14L, 15L), table)
    val (r2, s2) = CorpusRefresh.refresh(spark, table, Some(v1), ledger,
      ivfPath = Some(ivf), embeddings = Some(embs(11L, 12L, 13L, 14L, 15L)),
      minJaccard = 0.9, ivfNlist = 2)
    assert(r2.fromVersion == v1 && r2.toVersion == v2)
    assert(r2.newDocs == 5, s"newDocs=${r2.newDocs}")
    // pairs: (1,11) anchor, (11,12) within, (13,14) within — (1,12) is
    // below threshold and must be verification-filtered even if banded
    assert(r2.nearDupPairs == 3, s"pairs=${r2.nearDupPairs}")
    // component {11,12} anchors to resident 1 → both drop; {13,14} keeps
    // min id 13; 15 survives untouched
    assert(r2.droppedAnchoredToResident == 2, s"anchored=${r2.droppedAnchoredToResident}")
    assert(r2.droppedWithinIncrement == 1, s"within=${r2.droppedWithinIncrement}")
    assert(r2.survivors == 2)
    assert(s2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(13L, 15L))
    // ledger grew by EXACTLY the increment (residents never re-signed)
    assert(parquetRows(ledger.sketches) == 8)
    assert(parquetRows(ledger.bands) == 8 * 8)
    // IVF holds bootstrap 3 + survivor 2 vectors, survivors queryable
    assert(r2.vectorsAppended == 2)
    assert(parquetRows(s"$ivf/cells") == 5)
    // survivors queryable: a fresh probe sitting on 15's vector (queryIvf
    // excludes self-matches, so probe with a new id) must return 15
    val idx = graft.ops.Ann.loadIvfIndex(spark, ivf)
    val probe = Seq((999L, Array(15.0, 1.0, 0.0, 1.0))).toDF("vec_id", "emb")
    val hit = graft.ops.Ann.queryIvf(idx,
      graft.ops.Ann.prepared(probe, "emb", "vec_id"), k = 1, nprobe = 2)
      .head()
    assert(hit.getAs[Long]("vec_id") == 15L)

    // idle refresh: zero work, zero writes
    val (r3, _) = CorpusRefresh.refresh(spark, table, Some(v2), ledger,
      ivfPath = Some(ivf), embeddings = Some(embs()), minJaccard = 0.9)
    assert(r3.newDocs == 0 && r3.survivors == 0 && r3.vectorsAppended == 0)
    assert(parquetRows(ledger.sketches) == 8 && parquetRows(s"$ivf/cells") == 5)

    // increment-pair union ≡ one-shot over the full corpus (same params)
    val oneShot = Dedup.minhashNearDupPairs(
      docs(1L, 2L, 3L, 11L, 12L, 13L, 14L, 15L), "text", "doc_id",
      minJaccard = 0.9).count()
    assert(oneShot == r1.nearDupPairs + r2.nearDupPairs,
      s"one-shot $oneShot != ${r1.nearDupPairs} + ${r2.nearDupPairs}")

    // a delete in the window refuses by name: the append-only ledger
    // cannot unlearn a signature
    VersionedTable.deleteWhere(spark, table, col("doc_id") === 2L)
    val e = intercept[IllegalArgumentException] {
      CorpusRefresh.refresh(spark, table, Some(v2), ledger, minJaccard = 0.9)
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
    graft.queries.Scratch.rmTree(new java.io.File(tmp))
  }

  test("quality gate keeps junk out of the LEDGER, not just the corpus; skew threshold auto-rebuilds") {
    val tmp = java.nio.file.Files.createTempDirectory("refresh_q").toString
    val table = s"$tmp/corpus"
    val ledger = Dedup.DedupLedger(s"$tmp/bands", s"$tmp/sketches")
    val ivf = s"$tmp/ivf"
    def embs(ids: Long*) = ids.map { i =>
      (i, Array(i.toDouble, (i % 7).toDouble, (i % 3).toDouble, 1.0))
    }.toDF("vec_id", "emb")
    val v1 = VersionedTable.commitAppend(docs(1L, 2L), table)
    CorpusRefresh.refresh(spark, table, None, ledger,
      ivfPath = Some(ivf), embeddings = Some(embs(1L, 2L)),
      minJaccard = 0.9, ivfNlist = 2)
    assert(parquetRows(ledger.sketches) == 2)
    // junk doc: 100 copies of one token — TTR 0.01, score ~0.005; the
    // good doc scores 0.5 (TTR 1.0 × length prior 0.5)
    val junk = (99L, Seq.fill(100)("x").mkString(" "))
    val inc = (Seq(junk) :+ (15L, fixture(15L))).toDF("doc_id", "text")
    VersionedTable.commitAppend(inc, table)
    val (r, s) = CorpusRefresh.refresh(spark, table, Some(v1), ledger,
      ivfPath = Some(ivf), embeddings = Some(embs(99L, 15L)),
      minJaccard = 0.9, minQuality = Some(0.1),
      ivfRebuildSkew = Some(1.0), ivfNlist = 2)
    assert(r.newDocs == 2 && r.droppedQuality == 1, r.toString)
    assert(r.survivors == 1 &&
      s.select("doc_id").as[Long].collect().toSeq == Seq(15L))
    // the junk doc never signed: a future near-dup of it must not be
    // suppressed by a ghost (3 = bootstrap 2 + the one gated survivor)
    assert(parquetRows(ledger.sketches) == 3)
    // threshold 1.0 <= any real skew: the rebuild ran and said so, and
    // the post-rebuild index still answers (vectors intact)
    assert(r.ivfRebuilt && r.ivfSkew.nonEmpty)
    assert(parquetRows(s"$ivf/cells") == 3)
    graft.queries.Scratch.rmTree(new java.io.File(tmp))
  }

  test("rebootstrap after erasure: ledger == fresh bootstrap on survivors; no ghost suppression") {
    val tmp = java.nio.file.Files.createTempDirectory("refresh_rb").toString
    val table = s"$tmp/corpus"
    val ledger = Dedup.DedupLedger(s"$tmp/ledger/bands", s"$tmp/ledger/sketches")
    VersionedTable.commitAppend(docs(1L, 2L, 3L), table)
    CorpusRefresh.refresh(spark, table, None, ledger, minJaccard = 0.9)
    // erasure pass: doc 2 must be forgotten
    VersionedTable.deleteWhere(spark, table, col("doc_id") === 2L)
    // the incremental path refuses the delete window (append-only ledger)
    intercept[IllegalArgumentException] {
      CorpusRefresh.refresh(spark, table,
        Some(VersionedTable.versions(spark, table).head), ledger, minJaccard = 0.9)
    }
    // the documented remedy, as a call: one signing pass over survivors
    val r = CorpusRefresh.rebootstrap(spark, table, ledger)
    assert(r.docsSigned == 2L, r.toString)
    assert(r.toVersion == VersionedTable.versions(spark, table).last)
    // ledger content == a FRESH bootstrap ledger over the surviving
    // snapshot (separate dir, same pass)
    val fresh = Dedup.DedupLedger(s"$tmp/fresh/bands", s"$tmp/fresh/sketches")
    Dedup.bootstrapLedger(
      VersionedTable.read(spark, table), fresh, "text", "doc_id")
    def rows(p: String, cols: String*) =
      spark.read.parquet(p).select(cols.map(col): _*)
        .collect().map(_.toSeq.map {
          case a: Seq[_] => a; case x => x
        }).sortBy(_.toString).toSeq
    assert(rows(ledger.bands, "band_idx", "band_hash", "doc_id") ==
      rows(fresh.bands, "band_idx", "band_hash", "doc_id"))
    assert(rows(ledger.sketches, "doc_id", "sh") ==
      rows(fresh.sketches, "doc_id", "sh"))
    // the erased doc's signatures are GONE: a new doc that near-dups
    // ERASED content must SURVIVE (no ghost suppression) — while one
    // near-dupping a SURVIVOR still drops
    VersionedTable.commitAppend(
      Seq((21L, fixture(2L)), (22L, text(baseA.updated(30, "zz"))))
        .toDF("doc_id", "text"), table)
    val (r2, s2) = CorpusRefresh.refresh(
      spark, table, Some(r.toVersion), ledger, minJaccard = 0.9)
    val kept = s2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(21L),
      s"doc 21 duplicates only the ERASED doc 2 — a ledger ghost " +
        s"suppressed it (kept=$kept)")
    assert(!kept.contains(22L),
      s"doc 22 near-dups surviving resident 1 and must drop (kept=$kept)")
    assert(r2.droppedAnchoredToResident == 1L, r2.toString)
    graft.queries.Scratch.rmTree(new java.io.File(tmp))
  }

  test("ivf path without embeddings refuses at declaration") {
    val tmp = java.nio.file.Files.createTempDirectory("refresh_req").toString
    VersionedTable.commitAppend(docs(1L), s"$tmp/t")
    val e = intercept[IllegalArgumentException] {
      CorpusRefresh.refresh(spark, s"$tmp/t", None,
        Dedup.DedupLedger(s"$tmp/b", s"$tmp/s"), ivfPath = Some(s"$tmp/ivf"))
    }
    assert(e.getMessage.contains("embeddings"))
    graft.queries.Scratch.rmTree(new java.io.File(tmp))
  }
}
