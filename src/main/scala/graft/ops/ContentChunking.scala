package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Content-defined chunking (the rsync/LBFS boundary trick at token
  * granularity): a chunk ends wherever the hash of the last `w` tokens
  * hits 0 mod `modulus`, so boundaries are a pure function of LOCAL
  * content — an insertion early in a document shifts one chunk instead
  * of re-aligning every fixed-size window downstream. That locality is
  * what makes CHUNK-level dedup robust to edits, where fixed windows
  * (q73) and whole-doc hashing both miss near-miss duplication.
  *
  * Expected chunk length is `modulus` tokens (geometric); boundaries use
  * the engine-portable md5-uniform, so the exact chunking — not just its
  * statistics — is DuckDB-replayable (q264). Scale shape: the whole
  * chunking is ROW-LOCAL — boundary flags, chunk spans, and chunk
  * assembly are one array-expression projection per document, and the
  * only explode emits CHUNK rows (≈ tokens/`modulus` of the old
  * token-explode). The r18 rewrite removed the token explode + doc-keyed
  * window + collect_list reassembly that shape carried: per-document
  * work needs no exchange, no sort, and no ObjectHashAggregate — on a
  * 100 TB corpus the old plan shuffled every token once to reassemble
  * chunks that were computable where the document already was. */
object ContentChunking {

  /** One row per (idCol, chunk_id): `chunk_text`, `n_tokens`.
    *
    * `idCol` semantics are PER ROW, not per id: a caller feeding
    * duplicate idCol values gets independent chunk rows per input row
    * (duplicate (id, chunk_id) pairs), where the pre-r18 windowed form
    * would have interleaved the duplicates' tokens into merged chunks.
    *
    * Semantics (unchanged from the windowed form, oracle-pinned by
    * q264/q265): a flag at token position i (0-based, i ≥ w−1) closes
    * the chunk AT i — the next chunk starts at i+1 — so chunk_id of a
    * token is the count of flags strictly before it; a flag on the last
    * token produces no empty trailing chunk; blank documents chunk to
    * nothing. */
  def chunks(
      docs: DataFrame, textCol: String, idCol: String,
      w: Int = 3, modulus: Int = 8): DataFrame = {
    require(w >= 1 && modulus >= 2, "window >= 1, modulus >= 2")
    val toks = TextFunctions.tokens(col(textCol))
    // chunk START positions (0-based): 0, plus i+1 for every boundary
    // flag at i < size−1 (a flag on the final token closes nothing)
    val starts = expr(
      s"""concat(array(0), transform(
         |  filter(sequence(0, size(_toks) - 1), i ->
         |    i >= ${w - 1} AND i < size(_toks) - 1 AND
         |    CAST(conv(substring(md5(concat('cdc-v1:',
         |      concat_ws(' ', slice(_toks, i - ${w - 2}, $w)))), 1, 8), 16, 10)
         |      AS BIGINT) % $modulus = 0),
         |  i -> i + 1))""".stripMargin)
    // k-th chunk spans [starts[k], nextStart) — assembled row-locally
    val chunksArr = expr(
      """transform(_starts, (s, k) -> named_struct(
        |  'chunk_id', CAST(k AS BIGINT),
        |  'chunk_text', concat_ws(' ', slice(_toks, s + 1,
        |     IF(k + 1 < size(_starts), element_at(_starts, k + 2), size(_toks)) - s)),
        |  'n_tokens', IF(k + 1 < size(_starts),
        |     element_at(_starts, k + 2), size(_toks)) - s))""".stripMargin)
    docs
      .withColumn("_toks", toks)
      // split("") yields [""]; an empty/blank document has no chunks
      .filter(length(trim(col(textCol))) > 0)
      .withColumn("_starts", starts)
      .select(col(idCol), explode(chunksArr).as("_c"))
      .select(
        col(idCol), col("_c.chunk_id").as("chunk_id"),
        col("_c.chunk_text").as("chunk_text"), col("_c.n_tokens").as("n_tokens"))
  }
}
