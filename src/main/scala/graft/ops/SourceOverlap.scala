package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source content-overlap matrix — "how much does source A share
  * with source B?" is the first question a corpus curator asks before
  * mixing sources (shared boilerplate inflates a mix's effective epochs;
  * DoReMi-style mixture tuning assumes sources are distinct).
  *
  * Overlap is counted in distinct word shingles (contiguous `shingleLen`
  * token windows), the same unit the MinHash dedup family uses
  * ([[Dedup]]): |shingles(A) ∩ shingles(B)| for every unordered source
  * pair.
  *
  * Scale design — never a corpus×corpus join:
  *   1. one shuffle keyed on the 64-bit shingle hash (8-byte key, like
  *      [[Dedup]]'s band keys) deduplicates (shingle, source) pairs and
  *      collects each shingle's source SET — bounded by the number of
  *      sources, not by data;
  *   2. shingles present in more than `maxSources` sources are dropped
  *      BEFORE pair expansion — the same quadratic-blowup cap as the LSH
  *      bucket cap: a boilerplate phrase present in every source would
  *      otherwise expand to #sources² rows per shingle while carrying no
  *      pair-specific signal;
  *   3. the surviving per-shingle pair expansion is ≤ maxSources²/2 rows
  *      per shingle, aggregated immediately.
  *
  * The oracle counts the same quantity via string equality; grouping on
  * the 64-bit hash is count-identical absent collisions (~n²/2⁶⁵ — for a
  * billion distinct shingles, ~0.03 expected collisions). */
object SourceOverlap {

  def shingleOverlap(
      df: DataFrame, textCol: String, sourceCol: String,
      shingleLen: Int = 4, maxSources: Int = 1000): DataFrame = {
    require(shingleLen >= 1, "shingleLen must be positive")
    val tk = split(col(textCol), " ")
    val shingles = df
      .select(col(sourceCol).as("src"), tk.as("tk"))
      .filter(size(col("tk")) >= shingleLen)
      .select(
        col("src"),
        explode(transform(
          sequence(lit(1), size(col("tk")) - lit(shingleLen - 1)),
          i => xxhash64(array_join(slice(col("tk"), i, lit(shingleLen)), " ")))).as("sh"))
    shingles
      .groupBy("sh")
      .agg(collect_set(col("src")).as("srcs"))
      .filter(size(col("srcs")).between(2, maxSources))
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_shingles"))
  }
}
