package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Test-set decontamination — the standard pre-training hygiene pass: flag
  * corpus documents whose word n-grams overlap an evaluation/benchmark set
  * (the GPT-3/PaLM-style "n-gram collision" check).
  *
  * Scale shape: the benchmark side is tiny by construction (eval sets are
  * thousands of docs vs billions in the corpus), so its distinct n-gram
  * union is one small aggregate broadcast to every executor. The corpus
  * side is a single scan with row-local set intersection — it never
  * explodes, never shuffles, and nothing in the plan grows faster than
  * O(corpus n-grams).
  */
object Decontaminate {

  /** Per-document n-gram overlap of `corpus` against the union of
    * `benchmark` n-grams.
    *
    * Output: (idCol, n_grams, n_hit) — distinct n-grams in the doc, and
    * how many of them occur anywhere in the benchmark. Docs with fewer
    * than `n` tokens have no n-grams and are dropped (callers wanting
    * them keep-all can left-join back). Callers derive the overlap
    * fraction and their flagging threshold.
    */
  def overlap(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    // N-grams travel as per-doc DISTINCT 64-bit hash sets (one fused
    // codegen pass, graft.functions.ShingleHashSetExpr) — the distinct is
    // what makes n_grams/n_hit count distinct doc n-grams, and hashing is
    // what keeps the benchmark union a compact long array. Identical
    // counts modulo 64-bit collisions.
    val grams = (df: DataFrame) =>
      df.filter(TextFunctions.tokenCount(col(textCol)) >= n)
        .select(
          col(idCol),
          graft.functions.ShingleHashSetExpr(
            TextFunctions.tokens(col(textCol)), n).as("_hs"))

    // The benchmark union is ONE row (a sorted long array) broadcast to
    // every task; per-doc overlap is then a row-local array_intersect.
    // The corpus side never explodes and never shuffles — the whole plan
    // is scan → project → broadcast-nested-loop(1 row) → project, vs the
    // previous explode (xN rows) → broadcast join → keyed re-aggregation.
    val benchSet = grams(benchmark)
      .select(explode(col("_hs")).as("_g")).distinct()
      .agg(sort_array(collect_list(col("_g"))).as("_bench"))

    grams(corpus)
      .join(broadcast(benchSet))
      .select(
        col(idCol),
        size(col("_hs")).cast("long").as("n_grams"),
        size(array_intersect(col("_hs"), col("_bench"))).cast("long").as("n_hit"))
  }

  /** N-gram containment of each `target` document against a DATA-SIZED
    * `reference` corpus — the case [[overlap]]'s broadcast deliberately
    * does not cover. The canonical use is split-leakage auditing: how
    * much of each test-split document already appears verbatim (at
    * n-gram granularity) in the train split, where BOTH sides are the
    * corpus itself and nothing is broadcastable.
    *
    * Scale shape: n-grams travel as 64-bit hashes (one fused codegen
    * pass per side), the reference set is a distinct on the 8-byte gram
    * key, and the probe is a keyed shuffle join gram→gram — the same
    * partitioning both sides already hash to, with per-doc counts
    * partial-aggregated map-side. Nothing is ever collected or
    * broadcast, so the plan survives reference corpora of any size.
    *
    * Output: (idCol, n_grams, n_hit) per target doc with ≥ n tokens —
    * same contract as [[overlap]], counts identical to string n-grams
    * modulo 64-bit collisions. */
  def containmentAgainst(
      target: DataFrame,
      reference: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    val grams = (df: DataFrame) =>
      df.filter(TextFunctions.tokenCount(col(textCol)) >= n)
        .select(
          col(idCol),
          explode(graft.functions.ShingleHashSetExpr(
            TextFunctions.tokens(col(textCol)), n)).as("_g"))
    val refSet = grams(reference).select(col("_g")).distinct()
      .withColumn("_hit", lit(1L))
    grams(target)
      .join(refSet, Seq("_g"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
  }

  /** SEMANTIC decontamination — the complement to [[overlap]]'s n-gram
    * collision check: paraphrased benchmark leakage shares no n-grams but
    * lands close in embedding space. Each corpus vector gets its max
    * cosine against the benchmark set; callers threshold (the published
    * practice pairs a high semantic bar with the exact n-gram one).
    *
    * Scale shape: the benchmark is tiny by construction → broadcast; the
    * corpus side stays a scan (broadcast-nested-loop against |bench|
    * rows), and the per-id max partial-aggregates map-side, so the one
    * shuffle carries |corpus| rows. Cosine is the fused codegen
    * expression; zero-norm vectors yield NaN and are reported as -1
    * (never spuriously contaminated).
    *
    * Input frames use [[Ann.prepared]]'s (vec_id, emb) shape. Output:
    * (vec_id, max_bench_sim). */
  /** Per-PROBE max corpus cosine — the transpose of [[semanticOverlap]]:
    * grouped on the broadcast probe ids, so "which eval/test docs leak
    * from the corpus" reads directly (q248's split-leakage audit). Same
    * scale shape: the corpus is scanned once, the probe set (eval-sized
    * by design) broadcasts, and the aggregate shuffles probe-count rows. */
  def semanticLeakage(corpus: DataFrame, probes: DataFrame): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("emb").as("_p_emb"))
    corpus
      .crossJoin(broadcast(p))
      .select(
        col("probe_id"),
        graft.functions.CosineSimilarity(col("emb"), col("_p_emb")).as("_sim"))
      .groupBy("probe_id")
      .agg(coalesce(max(when(!isnan(col("_sim")), col("_sim"))), lit(-1.0)).as("max_corpus_sim"))
  }

  def semanticOverlap(corpus: DataFrame, benchmark: DataFrame): DataFrame = {
    val b = benchmark.select(col("emb").as("_b_emb"))
    corpus
      .crossJoin(broadcast(b))
      .select(
        col("vec_id"),
        graft.functions.CosineSimilarity(col("emb"), col("_b_emb")).as("_sim"))
      .groupBy("vec_id")
      .agg(coalesce(max(when(!isnan(col("_sim")), col("_sim"))), lit(-1.0)).as("max_bench_sim"))
  }
}
