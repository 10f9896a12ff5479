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
}
