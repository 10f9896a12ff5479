package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusPipeline

/** The end-to-end corpus pipeline on a fixture where every stage has
  * exactly one victim, so the survivor set and the per-stage accounting
  * are both fully determined. */
class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def words(p: String) = (0 until 100).map(i => s"$p$i").mkString(" ")
  private val textA = words("a")
  private val textANear = words("a").replace("a50", "zz") // 1 of 100 tokens differs
  private val textB = words("b")
  private val textC = words("c")

  private lazy val corpus = Seq(
    (1L, textA),     // survives everything
    (2L, textA),     // exact dup of 1 -> exact_dedup drops
    (3L, textANear), // near-dup of 1 -> near_dup drops
    (4L, textB),     // survives everything
    (5L, "x x x"),   // degenerate -> quality drops
    (6L, textC)      // copy of the benchmark -> decontamination drops
  ).toDF("doc_id", "text")

  private lazy val benchmark = Seq((100L, textC)).toDF("doc_id", "text")

  test("each stage removes exactly its victim; counts ride the one action") {
    val prepared = CorpusPipeline.prepare(corpus, benchmark)
    val rows = prepared.result.select("doc_id", "split").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    // split is a pure function of doc_id — recompute independently
    rows.foreach { r =>
      val expected = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"split-v1:${r.getLong(0)}".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        val b = Integer.parseInt(hex, 16) % 100
        if (b < 80) "train" else if (b < 90) "val" else "test"
      }
      assert(r.getString(1) == expected, s"split mismatch for doc ${r.getLong(0)}")
    }
    val counts = prepared.stageCounts().toMap
    assert(counts == Map(
      "input" -> 6L, "quality" -> 5L, "exact_dedup" -> 4L,
      "near_dup" -> 3L, "decontaminated" -> 2L), s"stage accounting: $counts")
  }

  test("ingestAudited: good increment publishes metadata-only; bad one quarantines whole") {
    import graft.io.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("cp_wap").toString
    val tbl = root + "/corpus"; val quar = root + "/quarantine"
    val checks = Seq("quality" -> 0.5, "decontaminated" -> 0.5)

    // good increment: prepare keeps 2 of 6 but every checked stage holds
    val r1 = CorpusPipeline.ingestAudited(corpus, benchmark, tbl, quar, checks)
    assert(r1.published.contains(1L) && r1.violations.isEmpty)
    assert(r1.stageCounts.toMap.apply("input") == 6L)
    assert(VersionedTable.read(spark, tbl).count() == 2)
    // metadata-only adoption: the published files still live under their
    // staging dir name — publish moved a manifest, not bytes
    assert(VersionedTable.dataFiles(spark, tbl).forall(_.contains("staging-")))

    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(tbl))
        .map(f => f.getPath.stripPrefix(tbl) -> f.length()).toMap
    }
    val before = snapshot()

    // bad increment: all junk — the quality gate keeps 0, the audit
    // refuses, the WHOLE raw increment quarantines with the messages
    val junk = (10L until 16L).map(i => (i, "x x x")).toDF("doc_id", "text")
    val r2 = CorpusPipeline.ingestAudited(junk, benchmark, tbl, quar, checks)
    assert(r2.published.isEmpty)
    assert(r2.violations.exists(_.startsWith("quality: kept 0 of 6")), r2.violations)
    assert(snapshot() == before,
      "main table must be byte-identical after a quarantined increment")
    val q = VersionedTable.read(spark, quar)
    assert(q.count() == 6)
    val msg = q.select("_audit_failures").distinct().collect()
    assert(msg.length == 1 && msg(0).getString(0).contains("quality"), msg.toSeq)

    // the failure leaves the table publishable: the next good increment lands
    val more = Seq((20L, words("d")), (21L, words("e"))).toDF("doc_id", "text")
    val r3 = CorpusPipeline.ingestAudited(more, benchmark, tbl, quar, checks)
    assert(r3.published.contains(2L))
    assert(VersionedTable.read(spark, tbl).count() == 4)
    assert(VersionedTable.stagedPending(spark, tbl) == 0, "no stuck audits")
  }

  test("ingestAudited refuses a check on the 'input' stage at declaration time") {
    // ADVICE r13: input's synthesized baseline is 0, so such a check
    // would silently quarantine EVERY increment — it must be a loud
    // config error before any work runs
    val root = java.nio.file.Files.createTempDirectory("cp_wap_in").toString
    val e = intercept[IllegalArgumentException](
      CorpusPipeline.ingestAudited(
        corpus, benchmark, root + "/t", root + "/q", Seq("input" -> 0.5)))
    assert(e.getMessage.contains("input"), e.getMessage)
    // nothing was staged or quarantined
    assert(!new java.io.File(root + "/t").exists())
    assert(!new java.io.File(root + "/q").exists())
  }

  test("redactPii scrubs BEFORE dedup, so PII-only-differing copies collapse") {
    // two docs identical except for the embedded email: after redaction
    // they are EXACT duplicates and the dedup gate keeps one
    val docs = Seq(
      (1L, textA + " contact alice@example.com"),
      (2L, textA + " contact bob@example.com"),
      (3L, textB)).toDF("doc_id", "text")
    val prepared = CorpusPipeline.prepare(docs, benchmark, redactPii = true)
    val rows = prepared.result.select("doc_id", "text").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
      "PII-only variants must collapse to the smallest doc_id")
    assert(rows.forall(!_.getString(1).contains("@")),
      "emitted corpus must carry the redacted text")
    assert(rows.exists(_.getString(1).contains("<EMAIL>")))
    val counts = prepared.stageCounts().toMap
    assert(counts("exact_dedup") == 2L, s"accounting sees the collapse: $counts")
    // without redaction the same corpus keeps both variants
    val plain = CorpusPipeline.prepare(docs, benchmark)
    plain.result.collect()
    assert(plain.stageCounts().toMap.apply("exact_dedup") == 3L)
  }

  test("the optional semantic stage drops paraphrased leakage the n-gram stage missed") {
    // doc 4 paraphrases the benchmark: disjoint tokens (textB vs textC),
    // but its embedding is nearly identical to the benchmark's — only the
    // semantic stage can catch it
    val corpusEmb = Seq(
      (1L, Array(0.0, 1.0, 0.0)), // far from the benchmark -> survives
      (4L, Array(0.999, 0.04, 0.0))).toDF("vec_id", "emb")
    val benchEmb = Seq((100L, Array(1.0, 0.04, 0.0))).toDF("vec_id", "emb")
    val prepared = CorpusPipeline.prepare(
      corpus, benchmark, embeddings = Some((corpusEmb, benchEmb)), maxSemanticSim = 0.99)
    assert(prepared.result.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L))
    val counts = prepared.stageCounts().toMap
    assert(counts("decontaminated") == 2L && counts("semantic") == 1L,
      s"stage accounting: $counts")
    // without embeddings the paraphrase survives (the n-gram check is blind to it)
    val withoutSem = CorpusPipeline.prepare(corpus, benchmark)
    assert(withoutSem.result.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("the optional DSIR stage keeps the most target-like survivors") {
    // survivors after cleaning are docs 1 (a-words) and 4 (b-words); a
    // target of a-words makes doc 1's importance weight dwarf doc 4's
    // (every token scores positive vs negative), far beyond Gumbel noise
    val target = Seq((200L, words("a"))).toDF("doc_id", "text")
    val prepared = CorpusPipeline.prepare(corpus, benchmark, dsir = Some((target, 1)))
    assert(prepared.result.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val counts = prepared.stageCounts().toMap
    assert(counts("decontaminated") == 2L && counts("dsir_selected") == 1L,
      s"stage accounting: $counts")
    // keepN covering all survivors changes nothing
    val all = CorpusPipeline.prepare(corpus, benchmark, dsir = Some((target, 10)))
    assert(all.result.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("keepBestQuality retains the highest-quality near-dup, not the lowest id") {
    // doc 7 extends doc 1's text by 10 tokens: shingle Jaccard ~0.89 (a
    // near-dup) but longer -> higher quality score than doc 1
    val extended = textA + " " + (0 until 10).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, textA), (7L, extended), (4L, textB)).toDF("doc_id", "text")
    val defaultKeep = CorpusPipeline.prepare(docs, benchmark)
      .result.select("doc_id").as[Long].collect().sorted.toSeq
    assert(defaultKeep == Seq(1L, 4L), s"default must keep the lowest id: $defaultKeep")
    val bestKeep = CorpusPipeline.prepare(docs, benchmark, keepBestQuality = true)
      .result.select("doc_id").as[Long].collect().sorted.toSeq
    assert(bestKeep == Seq(4L, 7L), s"keepBestQuality must keep the longer doc: $bestKeep")
  }

  test("a fitted classifier drives the quality stage through the same accounting") {
    import graft.ml.QualityClassifier
    // weak labels: long diverse docs positive, degenerate short docs
    // negative — the classifier learns to separate them on n_tokens/ttr
    val labeled = QualityClassifier.features(
      ((0 until 40).map(i => (words(s"p$i"), 1.0)) ++
        (0 until 40).map(i => (s"x$i x$i x$i", 0.0))).toDF("text", "label"),
      "text")
    val fitted = QualityClassifier.fit(spark, labeled)

    // independent expectation: which corpus docs does the scorer pass?
    val passes = QualityClassifier
      .score(QualityClassifier.features(corpus, "text"), fitted)
      .filter(col("quality_prob") >= 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(passes == Seq(1L, 2L, 3L, 4L, 6L), s"classifier gate: $passes")

    val prepared = CorpusPipeline.prepare(
      corpus, benchmark, minQuality = 0.5,
      quality = QualityClassifier.scoreColumn(_, fitted))
    assert(prepared.result.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 4L))
    // observe counters ride the one action unchanged, quality = the gate
    val counts = prepared.stageCounts().toMap
    assert(counts == Map(
      "input" -> 6L, "quality" -> 5L, "exact_dedup" -> 4L,
      "near_dup" -> 3L, "decontaminated" -> 2L), s"stage accounting: $counts")
  }

  test("the pipeline is deterministic across runs and layouts") {
    val a = CorpusPipeline.prepare(corpus.repartition(7), benchmark)
      .result.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = CorpusPipeline.prepare(corpus.repartition(2), benchmark)
      .result.orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
