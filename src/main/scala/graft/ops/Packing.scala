package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing for training-data preparation: turning a corpus of
  * variable-length documents into fixed-`capacity` token sequences with
  * minimal padding — the step between a curated corpus and a dataloader.
  *
  * Two flavors, matching the two shapes real pipelines ship:
  *
  *  - [[packConcat]] (q139): concat-and-chunk. Documents are concatenated
  *    in id order within a shard and sliced at every `capacity` boundary;
  *    a document may straddle sequences. Zero padding except the final
  *    sequence of each shard. Pure window arithmetic — one per-SHARD
  *    window (never global; shards are the parallelism unit, exactly as
  *    training shards are packed independently by each dataloader worker).
  *  - [[packBins]] (q140): document-preserving greedy packing (next-fit).
  *    No document is ever split; a sequence takes documents in id order
  *    until the next one would overflow. Deterministic, one shuffle, O(1)
  *    state per shard — and next-fit's classic guarantee bounds waste:
  *    adjacent bins always sum past capacity, so bin count < 2·total/cap
  *    + #shards (PackingSpec asserts the bound).
  *
  * Both key every shuffle on the shard column and scale linearly: at
  * 100 TB the per-shard token totals (billions) stay well inside long
  * range, and no state anywhere is proportional to shard size except the
  * streamed iterator itself. */
object Packing {

  /** Concat-and-chunk packing: the exploded (document × sequence) chunk
    * map. Output, one row per intersection of a document with a
    * `capacity`-token sequence:
    *
    *   - `seq_id`: sequence index within the shard (0-based)
    *   - `tok_begin`/`tok_end`: the [begin, end) token slice OF THE
    *     DOCUMENT that lands in this sequence
    *   - `seq_offset`: where that slice starts within the sequence
    *
    * A downstream writer joins this map back to tokenized documents and
    * emits `slice(tokens, tok_begin+1, tok_end-tok_begin)` at
    * `seq_offset` — the map itself is the whole packing decision. */
  def packConcat(
      df: DataFrame, textCol: String, idCol: String, shardCol: String,
      capacity: Int): DataFrame = {
    require(capacity >= 1, "capacity must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shardCol).orderBy(idCol)
    df.select(
        col(shardCol), col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("cum_end", sum("n_tok").over(w))
      .withColumn("cum_begin", col("cum_end") - col("n_tok"))
      // the sequences this document touches: floor(cum_begin/cap) through
      // floor((cum_end-1)/cap) — integer division, exact at any scale
      .withColumn(
        "seq_id",
        explode(sequence(
          expr(s"cum_begin div $capacity"), expr(s"(cum_end - 1) div $capacity"))))
      .select(
        col(shardCol), col(idCol), col("seq_id"),
        (greatest(col("cum_begin"), col("seq_id") * capacity) - col("cum_begin"))
          .as("tok_begin"),
        (least(col("cum_end"), (col("seq_id") + 1) * capacity) - col("cum_begin"))
          .as("tok_end"),
        (greatest(col("cum_begin"), col("seq_id") * capacity) - col("seq_id") * capacity)
          .as("seq_offset"))
  }

  /** Materialize [[packConcat]]'s chunk map into actual packed sequences —
    * the collator output a trainer consumes: per (shard, seq_id) the
    * concatenated `tokens`, `segment_ids` (1-based document index within
    * the sequence, the attention-boundary mask: attention must not cross
    * a segment change), and `position_ids` (DOCUMENT-relative token
    * positions, so a document straddling two sequences keeps counting —
    * the "reset positions at document boundaries" convention).
    *
    * Plan shape: the chunk map joins the tokenized docs on (shard, id),
    * each intersection slices its piece row-locally, and ONE keyed
    * aggregate per sequence assembles the arrays via
    * `sort_array(collect_list(struct))` — state bounded by `capacity`
    * tokens per group, never by shard size. */
  def packSequences(
      df: DataFrame, textCol: String, idCol: String, shardCol: String,
      capacity: Int): DataFrame = {
    val m = packConcat(df, textCol, idCol, shardCol, capacity)
    val toks = df.select(
      col(shardCol).as("_sh"), col(idCol).as("_id"),
      TextFunctions.tokens(col(textCol)).as("_toks"))
    m.join(toks, m(shardCol) === col("_sh") && m(idCol) === col("_id"))
      .select(
        col(shardCol), col("seq_id"), col("seq_offset"), col("tok_begin"),
        expr("slice(_toks, int(tok_begin) + 1, int(tok_end - tok_begin))").as("piece"))
      .groupBy(shardCol, "seq_id")
      .agg(sort_array(collect_list(struct(
        col("seq_offset"), col("tok_begin"), col("piece")))).as("ps"))
      .select(
        col(shardCol), col("seq_id"),
        size(col("ps")).as("n_docs"),
        expr("flatten(transform(ps, p -> p.piece))").as("tokens"),
        expr("flatten(transform(ps, (p, i) -> array_repeat(i + 1, size(p.piece))))")
          .as("segment_ids"),
        expr("flatten(transform(ps, p -> transform(p.piece, (t, j) -> int(p.tok_begin) + j)))")
          .as("position_ids"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  final case class DocLen(shard: String, doc_id: Long, n_tok: Long)
  final case class PackedDoc(
      shard: String, doc_id: Long, n_tok: Long, bin: Long, bin_offset: Long)

  /** Document-preserving greedy packing (next-fit): documents in id order
    * within a shard fill a bin until the next would overflow `capacity`;
    * oversized documents (n_tok > capacity) land alone in their own bin
    * (flag or truncate downstream). One shuffle keyed on the shard;
    * `flatMapSortedGroups` streams each shard's documents in sorted order
    * through O(1) packing state — the legitimate per-partition imperative
    * case (a running fill that resets at a data-dependent boundary is not
    * expressible as a window). The DuckDB oracle mirrors it with a
    * recursive CTE, so q140 is exact-checked, not rows-only. */
  def packBins(
      df: DataFrame, textCol: String, idCol: String, shardCol: String,
      capacity: Int): Dataset[PackedDoc] = {
    require(capacity >= 1, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(shardCol).cast("string").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .as[DocLen]
      .groupByKey(_.shard)
      .flatMapSortedGroups(col("doc_id")) { (shard, docs) =>
        var bin = 0L
        var fill = 0L
        docs.map { d =>
          if (fill > 0 && fill + d.n_tok > capacity) { bin += 1; fill = 0L }
          val out = PackedDoc(shard, d.doc_id, d.n_tok, bin, fill)
          fill += d.n_tok
          out
        }
      }
  }
}
