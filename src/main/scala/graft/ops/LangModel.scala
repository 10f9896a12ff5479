package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model scoring — the model-based half of corpus
  * quality filtering (the published pipelines score documents with a
  * cheap LM and drop the tail; a unigram model with add-one smoothing is
  * the fully-deterministic, oracle-checkable member of that family).
  *
  * Shuffle budget (the 100 TB shape):
  *   1. training is ONE keyed aggregation: explode → groupBy(token),
  *      map-side partial counts, shuffle carries one row per DISTINCT
  *      token (the vocabulary), never one per occurrence;
  *   2. the two model scalars (total tokens N, vocab size V) ride a
  *      one-row broadcast;
  *   3. scoring joins each document's distinct tokens against the vocab
  *      relation on the token key — a hash join on a vocabulary-sized
  *      side (broadcast when the vocab is dimension-sized), then one
  *      per-doc aggregation. Per-doc token multiplicity is kept in the
  *      exploded relation, so the join output is one row per (doc,
  *      distinct token) with its in-doc count — the smallest relation
  *      that still scores exactly.
  *
  * Score: mean over tokens of ln((cnt(tok) + 1) / (N + V)) — higher is
  * more typical of the corpus; exp(-score) is the per-token perplexity.
  */
object LangModel {

  /** Corpus unigram counts: (token, cnt). One keyed aggregation. */
  def unigramCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))

  /** Per-document average token log-probability under the add-one
    * smoothed unigram model `vocab` (as produced by [[unigramCounts]] —
    * possibly over a DIFFERENT reference corpus: scoring a candidate crawl
    * against a trusted corpus is the actual curation pattern). Tokens
    * absent from the vocab take the smoothed floor 1/(N+V). Output:
    * (idCol, n_tokens, avg_logprob). */
  def scoreDocs(
      docs: DataFrame,
      vocab: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val scalars = vocab.agg(
      sum(col("cnt")).cast("double").as("n_total"),
      count(lit(1)).cast("double").as("v_size"))
    // one row per (doc, distinct token) with its in-doc multiplicity —
    // the join side stays vocabulary-keyed and the per-doc agg exact
    val docTokens = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    docTokens
      .join(vocab, Seq("token"), "left")
      .crossJoin(broadcast(scalars))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        (sum(col("tf") * log((coalesce(col("cnt"), lit(0L)) + lit(1)) / (col("n_total") + col("v_size"))))
          / sum(col("tf"))).as("avg_logprob"))
  }

  /** Corpus bigram counts: (w1, w2, cnt) over adjacent token pairs, one
    * keyed aggregation (map-side partials; the shuffle carries one row
    * per DISTINCT bigram). `minCount` prunes the long tail — the lever
    * that bounds model size at corpus scale (a 100 TB crawl's raw bigram
    * table rivals the corpus; every published n-gram LM ships pruned —
    * Brants et al. 2007 §3). Pruned bigrams fall to backoff at scoring
    * time, which is exactly what Stupid Backoff is for. */
  def bigramCounts(
      docs: DataFrame, textCol: String = "text", minCount: Long = 1L): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // adjacent pairs without positions: zip the array against its own tail
    // (arrays_zip of slices) — stays inside codegen, no posexplode join
    val pairs = docs
      .select(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))).as("w1"),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))).as("w2")).as("bg"))
      .select(explode(col("bg")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Per-document mean log-score under a bigram model with STUPID BACKOFF
    * (Brants et al. 2007 — the web-scale choice: no discounting, no
    * normalization, just back off with a fixed penalty):
    *
    *   S(w2 | w1) = cnt(w1,w2) / cnt(w1)                    when the bigram
    *                                                         survived pruning
    *              = alpha * (cnt(w2) + 1) / (N + V)          otherwise
    *
    * The backoff leg is the SMOOTHED unigram (add-one, as [[scoreDocs]])
    * so out-of-vocabulary w2 keeps a finite floor — the one deviation
    * from the paper's raw cnt(w2)/N, needed for a total function over
    * unseen text; the oracle replicates it exactly. Only bigram positions
    * score (a 1-token document yields no row). Scored positions keep
    * multiplicity through a (doc, distinct bigram, tf) relation — the
    * smallest join input that is still exact.
    *
    * Shuffle budget: one bigram-keyed join (model side pruned), two
    * vocabulary-keyed joins (broadcast when dimension-sized), one per-doc
    * aggregation. `unigrams`/`bigrams` may come from a DIFFERENT trusted
    * corpus than `docs` — scoring a crawl against a reference corpus is
    * the curation pattern. Output: (idCol, n_bigrams, avg_logscore). */
  def scoreDocsBackoff(
      docs: DataFrame,
      unigrams: DataFrame,
      bigrams: DataFrame,
      alpha: Double = 0.4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val scalars = unigrams.agg(
      sum(col("cnt")).cast("double").as("n_total"),
      count(lit(1)).cast("double").as("v_size"))
    val docBigrams = docs
      .select(col(idCol), arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))).as("w1"),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))).as("w2")).as("bg"))
      .select(col(idCol), explode(col("bg")).as("p"))
      .groupBy(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("tf"))
    val joined = docBigrams
      .join(bigrams.select(col("w1"), col("w2"), col("cnt").as("cb")), Seq("w1", "w2"), "left")
      .join(unigrams.select(col("token").as("w1"), col("cnt").as("c1")), Seq("w1"), "left")
      .join(unigrams.select(col("token").as("w2"), col("cnt").as("c2")), Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
    val score = when(col("cb").isNotNull && col("c1").isNotNull,
        log(col("cb").cast("double") / col("c1")))
      .otherwise(log(lit(alpha) * (coalesce(col("c2"), lit(0L)) + lit(1))
        / (col("n_total") + col("v_size"))))
    joined
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        (sum(col("tf") * score) / sum(col("tf"))).as("avg_logscore"))
  }
}
