package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — split each document into fixed-size
  * token chunks with a stride smaller than the chunk size, the standard
  * preprocessing step for context-bounded training samples and RAG-style
  * retrieval units (X-surface op; no analog in the reference).
  *
  * Scale shape: pure per-row narrow work — `split` → `sequence` of chunk
  * starts → `transform` slicing each window → `posexplode`. Everything is
  * codegen'd collection expressions; no shuffle, no UDF, no driver state.
  * Output size is rows × ⌈tokens/stride⌉, the intended data expansion.
  *
  * Chunk s (0-based) covers tokens [s·stride, s·stride + size); the last
  * chunk may be shorter; a chunk starts at every stride multiple < n, so
  * every token appears in ≥1 chunk and consecutive chunks overlap by
  * (size − stride) tokens.
  */
object Chunking {

  /** Explodes `textCol` (single-space-delimited tokens) into
    * `(… idCols, chunk_id, n_tok, chunk)` rows.
    *
    * @param size   tokens per chunk
    * @param stride tokens between chunk starts; must be ≤ size (overlap)
    */
  def slidingTokenChunks(
      docs: DataFrame, idCols: Seq[String], textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      "need 1 <= stride <= size")
    val toks = split(col(textCol), " ")
    val n = org.apache.spark.sql.functions.size(col("_toks"))
    val chunks = docs
      .withColumn("_toks", toks)
      // empty text → zero chunks (sequence() needs start <= stop for a
      // positive step, so guard n >= 1)
      .withColumn(
        "_starts",
        when(n >= 1, sequence(lit(0), n - 1, lit(stride)))
          .otherwise(array().cast("array<int>")))
      .select(
        (idCols.map(col) :+
          posexplode(transform(col("_starts"),
            s => slice(col("_toks"), s + lit(1), lit(size))))): _*)
      .withColumnRenamed("pos", "chunk_id")
    chunks.select(
      (idCols.map(col) :+
        col("chunk_id").cast("int").as("chunk_id") :+
        org.apache.spark.sql.functions.size(col("col")).as("n_tok") :+
        array_join(col("col"), " ").as("chunk")): _*)
  }
}
