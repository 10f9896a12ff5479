package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-list token membership (VERDICT r2 item 6).
  *
  * The TrainPrep queries test membership with `array_contains` inside
  * per-row lambdas — right for tiny lists (a 20-word vocab: the whole list
  * rides in the row, no join), but O(|list|) per token in an INTERPRETED
  * higher-order function if reused with a real 50k-entry stoplist. These
  * helpers are the scale form of the same operations: explode the tokens,
  * broadcast-hash-join the word set (O(1) per token, codegen'd), and
  * re-aggregate per document — order preserved through `posexplode` where
  * the output is a token sequence.
  *
  * Cutover rule (documented contract, not auto-detected): keep the array
  * path below ~1k list entries; switch to these above. The shuffle added
  * by the re-aggregation is keyed on the doc id — the same distribution
  * the downstream per-doc pass needs anyway.
  */
object Membership {

  private def wordSet(words: DataFrame): DataFrame =
    words.toDF("_w").distinct()

  /** Per-doc out-of-vocabulary counts against `vocab` (a one-column word
    * DataFrame): (idCol, n_tok, n_oov). Docs with zero tokens produce no
    * row (nothing to explode) — callers wanting keep-all left-join back,
    * same contract as [[Decontaminate.overlap]]. */
  def oovCounts(docs: DataFrame, idCol: String, toks: Column, vocab: DataFrame): DataFrame =
    docs.select(col(idCol), explode(toks).as("_w"))
      .join(broadcast(wordSet(vocab).withColumn("_in", lit(1))), Seq("_w"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("_in").isNull, 1).otherwise(0)).as("n_oov"))

  /** Tokenizer ENCODE: map each token to its id in `vocab` (columns
    * (word, id)), out-of-vocabulary tokens to the sentinel id 0 —
    * posexplode → broadcast hash join → positional re-assembly, the scale
    * form of "tokenize to ids". Output: (idCol, n_tok, n_oov, ids) with
    * `ids` in original token order. Docs with zero tokens produce no row
    * (same contract as [[oovCounts]]).
    *
    * OOV is detected from the join miss (`_id IS NULL`) BEFORE the
    * sentinel substitution, so `n_oov` is exact for ANY vocabulary —
    * including zero-based ones. With a zero-based vocab the `ids` column
    * is still ambiguous (a genuine id 0 renders like the OOV sentinel);
    * callers who need both must shift their vocab ids to start at 1 —
    * the standard tokenizer convention this helper assumes. */
  def encodeTokens(docs: DataFrame, idCol: String, toks: Column, vocab: DataFrame): DataFrame = {
    val v = vocab.toDF("_w", "_id")
    docs.select(col(idCol), posexplode(toks).as(Seq("_pos", "_w")))
      .join(broadcast(v), Seq("_w"), "left")
      .select(
        col(idCol), col("_pos"),
        col("_id").isNull.as("_oov"),
        coalesce(col("_id"), lit(0)).as("_id"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("_oov"), 1).otherwise(0)).as("n_oov"),
        transform(
          array_sort(collect_list(struct(col("_pos"), col("_id")))),
          x => x.getField("_id")).as("ids"))
  }

  /** Tokenizer ENCODE, broadcast-map form — the COMMON case: every
    * production tokenizer vocabulary (50k–200k entries) fits in executor
    * memory, so the encode is one scan with a hash-map lookup per token:
    * no explode, no join, NO SHUFFLE (the [[encodeTokens]] join form
    * shuffles one row per token for the re-assembly). Same output
    * contract as [[encodeTokens]] — (idCol, n_tok, n_oov, ids), OOV
    * counted from the lookup miss before the 0 sentinel, zero-token docs
    * produce no row — and MembershipSpec pins the two paths equal.
    * `maxEntries` guards the driver collect; above it, use the join form
    * (that is what it is for). `idCol` must be long-typed; vocab ids cast
    * to int. */
  def encodeTokensBroadcast(
      docs: DataFrame, idCol: String, toks: Column, vocab: DataFrame,
      maxEntries: Int = 2000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val entries = vocab.toDF("_w", "_id")
      .select(col("_w").cast("string"), col("_id").cast("int"))
      .limit(maxEntries + 1)
      .as[(String, Int)].collect()
    require(entries.length <= maxEntries,
      s"vocab exceeds $maxEntries entries — use the join form encodeTokens")
    // one compiled stage: tokenize → UTF8String-keyed lookup → project.
    // The struct column is referenced twice; whole-stage codegen's
    // subexpression elimination evaluates it once per row.
    val enc = graft.functions.VocabEncodeExpr(col("_toks"), entries.toSeq)
    docs.select(col(idCol).cast("long").as(idCol), toks.as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(
        col(idCol),
        size(col("_toks")).cast("long").as("n_tok"),
        enc.getField("n_oov").as("n_oov"),
        enc.getField("ids").as("ids"))
  }

  /** Order-preserving stoplist removal: posexplode → broadcast LEFT ANTI
    * join → re-assemble by original position. Every doc id comes back —
    * a doc whose every token is stopped yields an empty `kept` array. */
  def pruneTokens(docs: DataFrame, idCol: String, toks: Column, stop: DataFrame): DataFrame = {
    val kept = docs.select(col(idCol), posexplode(toks).as(Seq("_pos", "_w")))
      .join(broadcast(wordSet(stop)), Seq("_w"), "left_anti")
      .groupBy(idCol)
      .agg(transform(
        array_sort(collect_list(struct(col("_pos"), col("_w")))),
        x => x.getField("_w")).as("kept"))
    docs.select(col(idCol))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("kept"), array().cast("array<string>")).as("kept"))
  }
}
