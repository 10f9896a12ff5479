package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Ann, Pq}

/** Product quantization (`ops.Pq`): exact recovery on a codebook-grid
  * corpus (zero quantization error → ADC == exact cosine), code-shape
  * invariants, recall against brute force on the fixture embeddings,
  * and determinism. */
@org.scalatest.tags.Slow
class PqSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Corpus whose vectors are exact combinations of 4 distinct patterns
    * per 4-dim subspace — k-means with k=4 recovers the patterns, so PQ
    * becomes lossless on this corpus. */
  private def gridCorpus(n: Int, m: Int): org.apache.spark.sql.DataFrame = {
    val dsub = 4
    val patterns = Array(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
    val rng = new scala.util.Random(7)
    (0 until n).map { id =>
      val v = (0 until m).flatMap(_ => patterns(rng.nextInt(4)).toSeq)
      (id.toLong, v)
    }.toDF("vec_id", "emb")
  }

  test("lossless on a codebook-grid corpus: ADC similarities equal exact cosine") {
    val corpus = gridCorpus(200, m = 4) // dim 16
    val cb = Pq.train(corpus, m = 4, ksub = 4)
    val encoded = Pq.encode(corpus, cb)
    val probes = corpus.orderBy("vec_id").limit(5)
    val pq = Pq.queryTopK(encoded, cb, probes, 5)
      .select("probe_id", "vec_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    val exact = Ann.bruteForceTopK(corpus, probes, 5)
      .as[(Long, Long, Double)].collect().toSet
    // zero quantization error: same neighbor SETS with the same sims
    assert(pq.map(t => (t._1, t._2)) == exact.map(t => (t._1, t._2)))
    val exactSim = exact.map(t => (t._1, t._2) -> t._3).toMap
    pq.foreach { case (p, v, s) => assert(math.abs(s - exactSim((p, v))) < 1e-6) }
  }

  test("codes have shape (m) with values < ksub; 8 bytes describe a 64-dim vector") {
    val corpus = Ann.prepared(Tables.embeddings(spark, sf), "embedding", "vec_id")
    val cb = Pq.train(corpus, m = 8, ksub = 16)
    assert(cb.dsub == 8)
    val encoded = Pq.encode(corpus, cb)
    val bad = encoded.filter(
      size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 16))
    assert(bad.count() == 0)
    assert(encoded.count() == corpus.count())
  }

  test("recall@5 against brute force clears the compressed-scan bar on fixture embeddings") {
    val corpus = Ann.prepared(Tables.embeddings(spark, sf), "embedding", "vec_id")
    val cb = Pq.train(corpus, m = 8, ksub = 16)
    val encoded = Pq.encode(corpus, cb).cache()
    val probes = corpus.orderBy("vec_id").limit(20)
    val pq = Pq.queryTopK(encoded, cb, probes, 5)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = Ann.bruteForceTopK(corpus, probes, 5)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (pq & exact).size.toDouble / exact.size
    // 32x compression keeps a usable neighborhood structure even on
    // near-random fixtures; production tuning (bigger ksub, IVF compose,
    // re-rank survivors at full precision) pushes this toward 1
    assert(recall >= 0.3, s"recall@5 = $recall")
    encoded.unpersist()
  }

  test("exact re-rank over a PQ shortlist beats (or ties) the raw compressed scan") {
    val corpus = Ann.prepared(Tables.embeddings(spark, sf), "embedding", "vec_id")
    val cb = Pq.train(corpus, m = 8, ksub = 16)
    val encoded = Pq.encode(corpus, cb).cache()
    val probes = corpus.orderBy("vec_id").limit(20)
    val exact = Ann.bruteForceTopK(corpus, probes, 5)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    val raw = recall(Pq.queryTopK(encoded, cb, probes, 5))
    val reranked = recall(Pq.queryTopKRerank(encoded, corpus, cb, probes, 5, shortlist = 50))
    assert(reranked >= raw, s"re-rank recall $reranked fell below raw PQ $raw")
    assert(reranked >= 0.6, s"50-wide shortlist + exact re-rank should be strong, got $reranked")
    // re-ranked sims are EXACT cosine: each must match brute force where overlapping
    val bf = Ann.bruteForceTopK(corpus, probes, 50)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    Pq.queryTopKRerank(encoded, corpus, cb, probes, 5, 50)
      .as[(Long, Long, Double)].collect().foreach { case (p, v, s) =>
        bf.get((p, v)).foreach(e => assert(math.abs(s - e) < 1e-6))
      }
    encoded.unpersist()
  }

  test("IVF x PQ: full-coverage probing equals the plain compressed scan; narrow probing stays sane") {
    val corpus = Ann.prepared(Tables.embeddings(spark, sf), "embedding", "vec_id")
    val index = Ann.buildIvfIndex(corpus, nlist = 8)
    val cb = Pq.train(corpus, m = 8, ksub = 16)
    val encodedCells = Pq.encodeIvfPq(index, cb).cache()
    val probes = corpus.orderBy("vec_id").limit(10)
    // nprobe = nlist: every cell scored -> identical to the plain PQ scan
    val full = Pq.queryIvfPq(encodedCells, index.centroids, cb, probes, 5, nprobe = 8)
      .as[(Long, Long, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
    val plain = Pq.queryTopK(Pq.encode(corpus, cb), cb, probes, 5)
      .as[(Long, Long, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(full == plain, "nprobe == nlist must degrade to the unscoped compressed scan")
    // narrow probing: 5 results per probe from ~nprobe/nlist of the corpus
    val narrow = Pq.queryIvfPq(encodedCells, index.centroids, cb, probes, 5, nprobe = 3)
    assert(narrow.groupBy("probe_id").count()
      .filter(col("count") =!= 5).count() == 0)
    // candidates only ever come from probed cells: recall vs the full scan
    // is bounded but must stay useful
    val fullSet = full.map(t => (t._1, t._2)).toSet
    val narrowSet = narrow.select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val agree = (narrowSet & fullSet).size.toDouble / fullSet.size
    assert(agree >= 0.4, s"nprobe=3/8 agreement with the full scan fell to $agree")
    encodedCells.unpersist()
  }

  test("training and query are deterministic run to run") {
    val corpus = Ann.prepared(Tables.embeddings(spark, sf), "embedding", "vec_id")
    def once(): Seq[(Long, Long, Double)] = {
      val cb = Pq.train(corpus, m = 8, ksub = 16)
      Pq.queryTopK(Pq.encode(corpus, cb), cb, corpus.orderBy("vec_id").limit(10), 5)
        .as[(Long, Long, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
    }
    assert(once() == once())
  }
}
