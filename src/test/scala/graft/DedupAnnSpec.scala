package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, Vectors}
import graft.ops.{Ann, Dedup, Multimodal}

class DedupAnnSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different words about spark engines here"),
    (4L, "another unrelated document with its own vocabulary entirely")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts duplicates") {
    val out = Dedup.exactByHash(docs, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(out.length == 4)
    val first = out.head
    assert(first.getAs[Long]("keep_id") == 0L && first.getAs[Long]("dup_cnt") == 2L)
  }

  test("minhash LSH finds the exact and near duplicate pairs") {
    val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id", minJaccard = 0.5)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs.contains((0L, 2L))) // exact dup always collides
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 2L))) // near-dup
  }

  test("exact-dup pair has jaccard 1.0 in minhash verification") {
    val out = Dedup.minhashNearDupPairs(docs, "text", "doc_id")
      .filter(col("a_id") === 0 && col("b_id") === 2).collect()
    assert(out.length == 1 && out.head.getAs[Double]("jac") == 1.0)
  }

  test("simhash distance is 0 for identical docs and small for near-dups") {
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id", maxDist = 16)
      .collect().map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")), r.getAs[Int]("dist")))
      .toMap
    assert(pairs((0L, 2L)) == 0)
    assert(pairs.get((0L, 1L)).forall(_ <= 16))
  }

  test("jaccard expression: identical sets 1.0, disjoint 0.0") {
    val df = Seq(
      (Seq("a b c", "b c d"), Seq("a b c", "b c d"), 1.0),
      (Seq("a b c"), Seq("x y z"), 0.0)
    ).toDF("a", "b", "expected")
    df.select((TextFunctions.jaccard(col("a"), col("b")) === col("expected")).as("ok"))
      .collect().foreach(r => assert(r.getAs[Boolean]("ok")))
  }

  private val vecs = {
    // cluster A around e1, cluster B around e2, orthogonal
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.98f, 0.0f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.1f, 0.99f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 0.0f, 1.0f)))
    base.toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks same-cluster vectors first") {
    val corpus = Ann.prepared(vecs, "embedding", "vec_id")
    val probe = corpus.filter(col("vec_id") === 0)
    val top = Ann.bruteForceTopK(corpus, probe, 2).orderBy(col("sim").desc).collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSet == Set(1L, 2L))
    assert(top.forall(_.getAs[Double]("sim") > 0.9))
  }

  test("LSH top-k finds clustered neighbors (recall on separable data)") {
    val corpus = Ann.prepared(vecs, "embedding", "vec_id")
    val probe = corpus.filter(col("vec_id") === 0)
    val got = Ann.lshTopK(corpus, probe, 2, nPlanes = 4, dim = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got.intersect(Set(1L, 2L)).nonEmpty)
  }

  test("Corpus.clean: length gates, diversity gate, and dedup all fire") {
    val longText = (1 to 60).map(i => s"w$i").mkString(" ")       // diverse, in range
    val tooLong = (1 to 500).map(i => s"w$i").mkString(" ")       // > maxTokens
    val tooShort = "a b c"                                        // < minTokens
    val repetitive = Seq.fill(60)("same").mkString(" ")           // ttr ~ 0.017
    val docs = Seq(
      (0L, longText, "en"), (1L, tooLong, "en"), (2L, tooShort, "en"),
      (3L, repetitive, "en"), (4L, longText, "en") // exact dup of 0
    ).toDF("doc_id", "text", "lang")
    val kept = graft.ops.Corpus.clean(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L)) // dup keeps smallest id; gates drop 1,2,3
  }

  test("IVF top-k achieves high recall on separable clustered data") {
    val rng = new scala.util.Random(3)
    // 8 well-separated clusters in 16d: centers are +-5 on distinct axes
    val clustered = (0 until 400).map { i =>
      val c = i % 8
      val base = Array.fill(16)(0.0f)
      base(c) = 5.0f
      (i.toLong, base.map(v => v + rng.nextGaussian().toFloat * 0.1f))
    }.toDF("vec_id", "embedding")
    val corpus = Ann.prepared(clustered, "embedding", "vec_id")
    val probes = corpus.filter(col("vec_id") < 8)
    val brute = Ann.bruteForceTopK(corpus, probes, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(corpus, probes, 5, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall > 0.9, s"IVF recall $recall too low on separable clusters")
  }

  test("cosine expression matches manual computation") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val sim = df.select(Vectors.cosine(col("a"), col("b")).as("s")).collect()(0).getDouble(0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(sim - expected) < 1e-12)
  }

  test("multimodal features come from REAL container parses (PNG/BMP round-trip)") {
    val media = Multimodal.imagesFromDocuments(spark, docs.withColumn("lang", lit("en")))
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    val n = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8").length
    // doc_id 0 is even -> PNG: 8 sig + 25 IHDR + (12+n) IDAT + 12 IEND
    val f0 = feats(0L)
    assert(f0.format == "png" && f0.n_bytes == 57 + n)
    assert(f0.width == 1 + n % 512 && f0.height == 1 + (n * 7) % 384)
    assert(f0.channels == (if (n % 2 == 0) 3 else 4))
    // odd doc_ids -> BMP: 54-byte header + payload, 24bpp = 3 channels
    assert(feats.filterKeys(_ % 2 == 1).values.forall(f => f.format == "bmp" && f.channels == 3))
    // a corrupted container is dropped by triage, not failed
    import spark.implicits._
    val bad = spark.createDataset(Seq(Multimodal.MediaRecord(99L, Array[Byte](1, 2, 3))))
    assert(Multimodal.extractFeatures(spark, bad).isEmpty)
  }

  test("semantic decontamination: zero-norm corpus vectors report -1, never flagged") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0, 0.0)), // identical to a bench vector -> sim 1
      (2L, Array(0.0, 0.0))  // zero norm: cosine undefined -> -1 sentinel
    ).toDF("vec_id", "emb")
    val bench = Seq((100L, Array(1.0, 0.0))).toDF("vec_id", "emb")
    val got = graft.ops.Decontaminate.semanticOverlap(corpus, bench)
      .orderBy("vec_id").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0), (2L, -1.0)))
  }
}
