package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * statistics — is DuckDB-replayable (q264). Scale shape: the boundary
  * flags are a row-local projection; chunk ids ride ONE doc-keyed window
  * over exploded tokens and chunks assemble in the same keyed
  * aggregation — nothing global, state bounded by document length. */
object ContentChunking {

  /** One row per (idCol, chunk_id): `chunk_text`, `n_tokens`. */
  def chunks(
      docs: DataFrame, textCol: String, idCol: String,
      w: Int = 3, modulus: Int = 8): DataFrame = {
    require(w >= 1 && modulus >= 2, "window >= 1, modulus >= 2")
    val toks = TextFunctions.tokens(col(textCol))
    val flags = expr(
      s"""transform(sequence(0, size(_toks) - 1), i ->
         |  IF(i >= ${w - 1} AND
         |     CAST(conv(substring(md5(concat('cdc-v1:',
         |       concat_ws(' ', slice(_toks, i - ${w - 2}, $w)))), 1, 8), 16, 10)
         |       AS BIGINT) % $modulus = 0, 1, 0))""".stripMargin)
    val perTok = docs
      .withColumn("_toks", toks)
      // split("") yields [""]; an empty/blank document has no chunks
      .filter(length(trim(col(textCol))) > 0)
      .withColumn("_flags", flags)
      .select(col(idCol), posexplode(arrays_zip(col("_toks"), col("_flags"))))
      .select(
        col(idCol), col("pos"),
        col("col._toks").as("tok"), col("col._flags").as("flag"))
    val prior = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    perTok
      .withColumn("chunk_id", coalesce(sum("flag").over(prior), lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok")))).as("ps"))
      .select(
        col(idCol), col("chunk_id"),
        concat_ws(" ", expr("transform(ps, p -> p.tok)")).as("chunk_text"),
        size(col("ps")).as("n_tokens"))
  }
}
