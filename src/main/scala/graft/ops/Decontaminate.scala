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
  * side is a single scan → explode → broadcast hash join (no shuffle of
  * document text) → one keyed aggregation on the doc id. Nothing in the
  * plan grows faster than O(corpus n-grams).
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
    // array_distinct BEFORE the explode: per-doc dedup is row-local (no
    // shuffle), and it is what makes n_grams/n_hit count DISTINCT doc
    // n-grams — a doc repeating a contaminated n-gram must not count it
    // twice toward the overlap fraction.
    val grams = (df: DataFrame) =>
      df.filter(TextFunctions.tokenCount(col(textCol)) >= n)
        .select(
          col(idCol),
          explode(array_distinct(
            TextFunctions.shingles(TextFunctions.tokens(col(textCol)), n))).as("_g"))

    val benchGrams = grams(benchmark).select("_g").distinct().withColumn("_hit", lit(1))

    grams(corpus)
      .join(broadcast(benchGrams), Seq("_g"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0))).as("n_hit"))
  }
}
