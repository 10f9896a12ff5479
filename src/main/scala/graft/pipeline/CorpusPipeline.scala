package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.{ConnectedComponents, Decontaminate, Dedup}

/** End-to-end training-corpus preparation — the composition the individual
  * operators exist for, as one call:
  *
  *   quality filter → exact dedup → near-dup clustering (keep one per
  *   group) → benchmark decontamination → deterministic split assignment
  *
  * Observability without extra jobs: every linear stage carries an
  * `observe` counter at its plan depth, so the ONE action that
  * materializes the result also yields the full per-stage row accounting
  * ([[graft.ops.QualityGate]]'s mechanism, chained). The near-dup stage
  * is inherently iterative (LSH pairs → connected-components label loop),
  * so it runs its own jobs first and contributes a doom-list anti-join to
  * the main plan — everything else is one pass over the corpus.
  *
  * Scale shape: every stage is a keyed shuffle, a broadcast, or a
  * row-local projection; nothing is driver-collected; near-dups ride the
  * same capped LSH machinery as the standalone operators.
  */
object CorpusPipeline {

  /** The prepared corpus plus a per-stage row-count thunk — call it after
    * ONE action has materialized `result`. Stages (in order): `input`,
    * `quality`, `exact_dedup`, `near_dup`, `decontaminated`, `semantic`
    * when embeddings are supplied, and `dsir_selected` when a DSIR
    * target is supplied. */
  final case class Prepared(result: DataFrame, stageCounts: () => Seq[(String, Long)])

  /** @param docs           corpus with `doc_id` and `textCol`
    * @param benchmark      held-out eval set to decontaminate against
    *                       (same `textCol`); its n-gram union is
    *                       broadcast, so it must be eval-sized
    * @param minQuality     keep docs with quality score ≥ this
    * @param minJaccard     near-dup threshold for keep-one-per-group
    * @param maxOverlapFrac drop docs with > this fraction of their
    *                       n-grams present in the benchmark
    * @param keepBestQuality near-dup groups keep their HIGHEST-quality
    *                       member (ties → lowest doc_id) instead of the
    *                       lowest doc_id — the published pipelines' keep
    *                       rule; exact-dup groups are identical text, so
    *                       min-id is already quality-max there
    * @param embeddings     optional SEMANTIC decontamination inputs:
    *                       (corpus embeddings, benchmark embeddings) in
    *                       [[graft.ops.Ann.prepared]]'s (vec_id, emb)
    *                       shape with vec_id == doc_id — catches
    *                       paraphrased leakage the n-gram stage cannot
    *                       ([[Decontaminate.semanticOverlap]])
    * @param maxSemanticSim drop docs whose max benchmark cosine ≥ this
    * @param quality        the quality-score expression over the text
    *                       column; defaults to the heuristic
    *                       [[TextFunctions.qualityScore]]. Plug a FITTED
    *                       trainable gate here
    *                       ([[graft.ml.QualityClassifier.scoreColumn]])
    *                       and the same scorer drives BOTH the quality
    *                       filter and the keep-best-quality dedup rule —
    *                       still a row-local expression, so the one-action
    *                       accounting and plan shape are unchanged
    * @param redactPii      scrub structured PII (emails/phones/IPv4 →
    *                       placeholder tokens, [[graft.ops.PiiScrub]])
    *                       BEFORE anything else, so quality scoring,
    *                       dedup hashing and the emitted corpus all see
    *                       the redacted text — the production order (a
    *                       post-dedup scrub would let two docs differing
    *                       only in PII escape the exact-dup gate).
    *                       Row-local codegen; plan shape unchanged
    * @param dsir           optional DSIR selection stage
    *                       ([[graft.ops.Dsir]]): (target corpus sharing
    *                       `textCol`, keepN) — after every cleaning
    *                       stage, keep only the keepN survivors whose
    *                       hashed bag-of-words is most target-like
    *                       (Gumbel sampling ∝ importance weight). Runs
    *                       its own bounded jobs like the near-dup stage.
    */
  def prepare(
      docsRaw: DataFrame,
      benchmark: DataFrame,
      textCol: String = "text",
      minQuality: Double = 0.3,
      minJaccard: Double = 0.8,
      maxOverlapFrac: Double = 0.5,
      keepBestQuality: Boolean = false,
      embeddings: Option[(DataFrame, DataFrame)] = None,
      maxSemanticSim: Double = 0.95,
      quality: Column => Column = TextFunctions.qualityScore,
      dsir: Option[(DataFrame, Int)] = None,
      redactPii: Boolean = false): Prepared = {
    val docs =
      if (!redactPii) docsRaw
      else docsRaw.withColumn(textCol, graft.ops.PiiScrub.redact(col(textCol)))
    val stages = Seq("input", "quality", "exact_dedup", "near_dup", "decontaminated") ++
      (if (embeddings.isDefined) Seq("semantic") else Nil) ++
      (if (dsir.isDefined) Seq("dsir_selected") else Nil)
    val obs = stages.map(s => s -> new Observation(s"cp_$s")).toMap
    def counted(df: DataFrame, stage: String): DataFrame =
      df.observe(obs(stage), count(lit(1)).as("n"))

    // Quality survivors are the population every later stage reasons
    // about (a filtered-out doc must not act as a dedup keeper). This
    // UN-observed frame feeds the dedup side computations; the observed
    // main chain below re-derives the same filter, keeping each
    // CollectMetrics name exactly once in the final plan.
    val clean = docs.filter(quality(col(textCol)) >= minQuality)

    // Near-dup doom list (iterative, own jobs): each group of transitive
    // near-dups keeps its smallest doc_id.
    val pairs = Dedup
      .minhashNearDupPairs(clean, textCol, "doc_id", minJaccard = minJaccard)
      .select("a_id", "b_id")
    val (labels, _) = ConnectedComponents.label(pairs)
    val nearDupDoom =
      if (!keepBestQuality)
        labels.filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
      else {
        // keep the best-quality member per component (tie -> lowest id);
        // the window partitions by component — groups are near-dup
        // clusters, small by construction, never a global sort
        import org.apache.spark.sql.expressions.Window
        val q = clean.select(
          col("doc_id").as("id"), quality(col(textCol)).as("_q"))
        val w = Window.partitionBy("comp").orderBy(col("_q").desc, col("id"))
        labels.join(q, Seq("id"))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") > 1)
          .select(col("id").as("doc_id"))
      }

    val cleanCounted = counted(docs, "input")
      .filter(quality(col(textCol)) >= minQuality)
      .transform(d => counted(d, "quality"))

    // Exact dedup: keep the smallest doc_id per content digest. The
    // digest groupBy is the q26 shape; survivors re-join by digest.
    val keepers = Dedup.exactByHash(clean, textCol, "doc_id")
      .select(col("content_hash"), col("keep_id"))
    val exactKept = counted(
      cleanCounted
        .withColumn("content_hash", sha2(col(textCol), 256))
        .join(keepers, Seq("content_hash"))
        .filter(col("doc_id") === col("keep_id"))
        .drop("content_hash", "keep_id"),
      "exact_dedup")

    val nearKept = counted(
      exactKept.join(nearDupDoom, Seq("doc_id"), "left_anti"),
      "near_dup")

    // Decontamination doom list, derived from the UN-observed chain (the
    // overlap scan must not duplicate the chain's CollectMetrics nodes):
    // docs whose benchmark n-gram overlap is too high go; docs too short
    // to have n-grams carry no contamination signal and stay.
    val contaminated = Decontaminate
      .overlap(clean, benchmark, textCol, "doc_id", n = 3)
      .filter(col("n_hit") > col("n_grams") * maxOverlapFrac)
      .select("doc_id")
    val decontaminated = counted(
      nearKept.join(contaminated, Seq("doc_id"), "left_anti"),
      "decontaminated")

    // Optional semantic stage: paraphrased benchmark leakage (close in
    // embedding space, disjoint in n-grams) anti-joins out the same way.
    // The doom list is a val so the DSIR survivor twin below reuses the
    // same frame instead of recomputing the overlap scan.
    val semanticDoom: Option[DataFrame] = embeddings.map {
      case (corpusEmb, benchEmb) =>
        Decontaminate.semanticOverlap(corpusEmb, benchEmb)
          .filter(col("max_bench_sim") >= maxSemanticSim)
          .select(col("vec_id").as("doc_id"))
    }
    val semKept = semanticDoom.fold(decontaminated) { doom =>
      counted(decontaminated.join(doom, Seq("doc_id"), "left_anti"), "semantic")
    }

    // Optional DSIR selection: fit the importance model on the SURVIVOR
    // population (an un-observed twin re-derived from the doom lists —
    // a dropped doc must not shape the raw distribution), then keep the
    // keepN most target-like survivors via one semi-join on doc_id.
    val dsirKept = dsir.fold(semKept) { case (target, keepN) =>
      val survivors = semanticDoom.toSeq
        .foldLeft(
          clean
            .withColumn("content_hash", sha2(col(textCol), 256))
            .join(keepers, Seq("content_hash"))
            .filter(col("doc_id") === col("keep_id"))
            .drop("content_hash", "keep_id")
            .join(nearDupDoom, Seq("doc_id"), "left_anti")
            .join(contaminated, Seq("doc_id"), "left_anti")) {
          (df, doom) => df.join(doom, Seq("doc_id"), "left_anti")
        }
      val weights = graft.ops.Dsir.logWeights(survivors, target, textCol, "doc_id")
      val keep = graft.ops.Dsir.selectTopN(weights, "doc_id", keepN).select("doc_id")
      counted(semKept.join(keep, Seq("doc_id"), "left_semi"), "dsir_selected")
    }

    // Deterministic split (q110's function): stable under corpus growth.
    val bucket = conv(
      substring(md5(concat(lit("split-v1:"), col("doc_id").cast("string"))), 1, 4),
      16, 10).cast("int") % 100
    val result = dsirKept.withColumn(
      "split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))

    Prepared(result, () => stages.map { s =>
      s -> (obs(s).get.getOrElse("n",
        sys.error(s"stage '$s' collected no count metric — was the result " +
          "materialized by an action that executes the observed plan?")) match {
        case n: Number => n.longValue()
        case other => sys.error(s"unexpected count metric for $s: $other")
      })
    })
  }

  /** Outcome of one [[ingestAudited]] increment: the published version
    * (None when the increment quarantined), the per-stage row counts the
    * audit judged, and the violations (empty on publish). */
  final case class IngestReport(
      published: Option[Long],
      stageCounts: Seq[(String, Long)],
      violations: Seq[String])

  /** Incremental corpus ingestion with [[prepare]]'s cleaning gates as
    * the WRITE-AUDIT-PUBLISH audit — the composition of the two flagship
    * pieces: prepare produces the increment's clean rows AND its
    * per-stage accounting; the staged write materializes both in ONE
    * action; the audit judges the accounting against declared keep-rate
    * expectations; then either one metadata-only publish adopts the
    * staged files, or the RAW increment routes WHOLE to the quarantine
    * table with the per-stage violation messages and the stage aborts.
    * The main table is untouched on the failure path by construction —
    * staged files are invisible until publish
    * ([[graft.io.VersionedTable.stageAppend]]).
    *
    * `checks` are (stage, minKeepFrac): each stage must retain at least
    * the fraction of the PREVIOUS stage's rows ([[Prepared.stageCounts]]
    * order) — the "did this increment suddenly go 90% duplicate/spam"
    * alarm that batch corpus ingestion needs. An empty increment fails
    * every declared check (0-row input cannot prove anything).
    *
    * Streaming twin: run this body inside `foreachBatch` — it composes
    * with the (writerId, batchId) txn via
    * [[graft.io.VersionedTable.publishStagedBatch]] the same way
    * [[graft.streaming.EventStreams.startAuditedVersionedSink]] does.
    *
    * Scale shape: everything rides prepare's plan (keyed shuffles +
    * broadcasts); the audit reads ONLY the observation counters (zero
    * extra jobs); publish is one manifest write. */
  def ingestAudited(
      increment: DataFrame,
      benchmark: DataFrame,
      tablePath: String,
      quarantinePath: String,
      checks: Seq[(String, Double)],
      textCol: String = "text",
      minQuality: Double = 0.3,
      minJaccard: Double = 0.8,
      maxOverlapFrac: Double = 0.5): IngestReport = {
    import graft.io.VersionedTable
    // a keep-ratio check on the FIRST stage can never pass: its baseline
    // is the synthesized empty predecessor (count 0), so every increment
    // would quarantine regardless of content — refuse at declaration
    // time (a loud config error) instead of silently eating ingests.
    // "input" has no upstream to be a ratio OF; gate later stages.
    require(!checks.exists(_._1 == "input"),
      "a minKeep check on the 'input' stage has no baseline (it is the " +
        "pipeline's first counter) — declare checks on downstream stages " +
        "(quality, exact_dedup, near_dup, decontaminated, ...)")
    val spark = increment.sparkSession
    // Pin the increment ONCE (bounded — increment-sized, never corpus-
    // sized): the quarantine path re-reads exactly these rows, and a
    // statically-foldable increment (a LocalRelation fixture) would
    // otherwise let the optimizer fold the quality filter + dedup join to
    // <empty> at PLAN time and erase the upstream CollectMetrics nodes
    // with the folded subtree — silently losing the very counters the
    // audit judges. A LogicalRDD is never constant-folded.
    val inc = increment.localCheckpoint(eager = true)
    val prepared = prepare(
      inc, benchmark, textCol,
      minQuality = minQuality, minJaccard = minJaccard,
      maxOverlapFrac = maxOverlapFrac)
    // ONE action: the eager localCheckpoint executes the observed plan —
    // populating the stage counters — and pins the survivor rows, so the
    // staged write below re-reads the computed partitions instead of
    // recomputing the pipeline. It runs with AQE OFF: when an increment
    // audits toward zero rows (exactly the case the audit exists for),
    // AQE's runtime empty-relation propagation replans the dedup join as
    // <empty> and cancels the not-yet-finished upstream stages — the
    // input/quality CollectMetrics then never execute and their counters
    // silently vanish. The action is increment-sized, so runtime
    // re-planning has nothing to offer it anyway.
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    val survivors =
      try prepared.result.localCheckpoint(eager = true)
      finally spark.conf.set(aqeKey, aqeWas)
    val counts = prepared.stageCounts()
    // lands the clean rows on disk, INVISIBLE (no manifest reference)
    val staged = VersionedTable.stageAppend(survivors, tablePath)
    val byStage = counts.toMap
    val prevOf = counts.map(_._1).zip("" +: counts.map(_._1)).toMap
    val violations = checks.flatMap { case (stage, minKeep) =>
      val prev = prevOf.getOrElse(stage,
        sys.error(s"unknown audit stage: $stage (have ${counts.map(_._1).mkString(", ")})"))
      val n = byStage(stage)
      val base = byStage.getOrElse(prev, 0L)
      val kept = if (base == 0L) 0.0 else n.toDouble / base
      if (base > 0L && kept >= minKeep) None
      else Some(f"$stage: kept $n of $base ($kept%.4f) < $minKeep%.4f after ${
        if (prev.isEmpty) "input" else prev}")
    }
    if (violations.isEmpty) {
      val v = VersionedTable.publishStaged(spark, tablePath, staged)
      IngestReport(Some(v), counts, Nil)
    } else {
      // the WHOLE raw increment quarantines (an analyst wants the rows
      // that FAILED the gates, not the survivors), stamped with every
      // per-stage violation; then the stage aborts — main table untouched
      VersionedTable.commitAppend(
        inc.withColumn("_audit_failures", lit(violations.mkString("; "))),
        quarantinePath)
      VersionedTable.abortStaged(spark, tablePath, staged)
      IngestReport(None, counts, violations)
    }
  }
}
