package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR — Xie et al., NeurIPS
  * 2023, arXiv:2302.03169): pick raw-corpus documents whose hashed
  * bag-of-words looks like a TARGET corpus (e.g. curated English) by
  * scoring each document with the log-likelihood ratio of two smoothed
  * hashed-unigram models, then sampling without replacement with
  * probability ∝ weight via the Gumbel top-k trick.
  *
  * Why this matters at 100 TB: quality selection over a web-scale corpus
  * must be a CONSTANT number of passes with no data-sized join. The whole
  * method reduces to
  *
  *   1. two token-keyed aggregations (target and raw hashed-bucket
  *      counts) whose results are ≤ k rows each — k is the feature-hash
  *      width, a constant (the paper uses 10⁴);
  *   2. one broadcast join of the ≤ k-row log-ratio table against the
  *      per-document bucket counts;
  *   3. one document-keyed sum.
  *
  * Nothing shuffles tokens across the cluster except the bucket
  * aggregation itself (map-side combined into ≤ k rows per task), and
  * nothing is ever collected to the driver.
  *
  * Determinism: the bucket hash is the engine's standard 48-bit md5
  * prefix (same draw as the epoch shuffle / negative sampling — modulo
  * bias ≤ k/2⁴⁸), so results are reproducible across runs and
  * mirrorable bit-for-bit by the DuckDB oracle. The Gumbel noise in
  * [[selectTopN]] is likewise a deterministic md5 uniform, never
  * `rand()`.
  */
object Dsir {

  /** Hash bucket of one token: first 48 bits of md5("seed:token") mod k.
    * Non-negative, so `pmod` and plain `%` agree — the oracle uses `%`. */
  def bucket(tok: Column, k: Int, seed: String): Column =
    pmod(
      conv(substring(md5(concat(lit(s"$seed:"), tok)), 1, 12), 16, 10).cast("long"),
      lit(k.toLong))

  /** Hashed unigram counts of a corpus: ≤ k rows (bucket, cnt). One
    * token-keyed aggregation; map-side partials collapse each task to
    * ≤ k rows before the shuffle. */
  def hashedCounts(df: DataFrame, textCol: String, k: Int, seed: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(bucket(col("tok"), k, seed).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Per-bucket log-probability ratio `log p_target(b) − log p_raw(b)`,
    * add-1 smoothed over the k buckets (every bucket is defined even if
    * one corpus never hits it). ≤ k rows — the broadcast side of
    * [[logWeights]]. */
  def logRatios(
      raw: DataFrame, target: DataFrame, textCol: String,
      k: Int, seed: String): DataFrame = {
    val tc = hashedCounts(target, textCol, k, seed)
      .withColumnRenamed("cnt", "t_cnt")
    val rc = hashedCounts(raw, textCol, k, seed)
      .withColumnRenamed("cnt", "r_cnt")
    val counts = tc.join(rc, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("t_cnt"), lit(0L)).as("t_cnt"),
        coalesce(col("r_cnt"), lit(0L)).as("r_cnt"))
    // corpus token totals = sums of the ≤ k bucket counts: a one-row
    // aggregate over a ≤ k-row relation, cross-joined back (broadcast)
    val totals = counts.agg(sum("t_cnt").as("t_tot"), sum("r_cnt").as("r_tot"))
    counts.crossJoin(broadcast(totals))
      .select(
        col("bucket"),
        (log((col("t_cnt") + lit(1)).cast("double") /
          (col("t_tot") + lit(k)).cast("double")) -
          log((col("r_cnt") + lit(1)).cast("double") /
            (col("r_tot") + lit(k)).cast("double"))).as("log_ratio"))
  }

  /** Per-document importance log-weight
    * `log w(x) = Σ_tokens log_ratio(bucket(token))`, computed as
    * `Σ_buckets cnt(doc, b) · log_ratio(b)` so tokens collapse to ≤ k
    * rows per document BEFORE the ratio join. Output:
    * (idCol, n_toks, log_w). Shapes: one (id, bucket)-keyed aggregation,
    * one broadcast join against the ≤ k-row ratio table, one id-keyed
    * sum. */
  def logWeights(
      raw: DataFrame, target: DataFrame, textCol: String, idCol: String,
      k: Int = 1 << 14, seed: String = "dsir-v1"): DataFrame = {
    val lr = logRatios(raw, target, textCol, k, seed)
    // per-doc bucket counts are ROW-LOCAL (r19, the ContentChunking/RLE
    // pattern): hash every token to its bucket inside the row, sort the
    // bucket array, run-length-encode with array expressions, and
    // explode already-aggregated (bucket, cnt) rows — the
    // (id, bucket)-keyed exchange the old explode → groupBy paid (one
    // shuffled row per distinct (doc, bucket) pair) disappears; the
    // multiset of (id, bucket, cnt) rows is identical (oracle-pinned by
    // q216/q217), and the only remaining data-sized exchange is the
    // final id-keyed sum at ONE partial row per document.
    raw
      .select(
        col(idCol),
        array_sort(transform(
          TextFunctions.tokens(col(textCol)), t => bucket(t, k, seed))).as("_b"))
      .withColumn("_starts", expr(
        """filter(sequence(0, size(_b) - 1), i ->
          |  i = 0 OR element_at(_b, i + 1) != element_at(_b, i))""".stripMargin))
      .select(col(idCol), explode(expr(
        """transform(_starts, (st, j) -> named_struct(
          |  'bucket', element_at(_b, st + 1),
          |  'cnt', CAST(IF(j + 1 < size(_starts),
          |     element_at(_starts, j + 2), size(_b)) - st AS BIGINT)))"""
          .stripMargin)).as("_c"))
      .select(col(idCol), col("_c.bucket").as("bucket"), col("_c.cnt").as("cnt"))
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(
        sum("cnt").as("n_toks"),
        sum(col("cnt").cast("double") * col("log_ratio")).as("log_w"))
  }

  /** Gumbel top-n resampling without replacement, probability ∝ exp(log_w):
    * perturb each document's log-weight with a deterministic Gumbel draw
    * `g = −ln(−ln u)`, `u = (md5₄₈(seed:id)+1) / (2⁴⁸+1)` ∈ (0,1), and keep
    * the n largest perturbed scores (Gumbel-max gives exact weighted
    * sampling without replacement). Ranking is [[GlobalRank]] — never an
    * unpartitioned window — ordered by (−score, id) so ties are total.
    * Output: the selected rows as (idCol, n_toks, log_w, rank). */
  def selectTopN(
      weights: DataFrame, idCol: String, n: Int,
      seed: String = "dsir-sel-v1"): DataFrame = {
    val u = (conv(
      substring(md5(concat(lit(s"$seed:"), col(idCol).cast("string"))), 1, 12),
      16, 10).cast("double") + 1.0) / lit((1L << 48).toDouble + 1.0)
    val scored = weights.withColumn("_score", col("log_w") - log(-log(u)))
    GlobalRank.ranked(scored, -col("_score"), Seq(col(idCol)))
      .filter(col("_grn") <= n)
      .select(col(idCol), col("n_toks"), col("log_w"), col("_grn").as("rank"))
  }
}
