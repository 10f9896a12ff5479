package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF term scoring over a document corpus — the classic
  * "characteristic terms per document" op a data-curation pipeline uses
  * for topic tagging and near-template detection.
  *
  * Shuffle budget (the 100 TB shape):
  *   1. explode → groupBy(doc, term) partial-aggregates map-side, so the
  *      shuffle carries one row per DISTINCT (doc, term), not one per
  *      token occurrence;
  *   2. document frequency reuses the tf relation (one row per doc-term,
  *      so `count(*)` by term IS df) — a second, vocabulary-sized shuffle;
  *   3. the corpus size joins in as a broadcast scalar and the df relation
  *      joins back on `term` (hash join on the vocabulary key; broadcast
  *      if the vocabulary is dimension-sized);
  *   4. top-k is a per-document window — partitioned, never global.
  */
object TfIdf {

  /** Top-`k` terms per document by `tf * ln(N / df)`, ties broken by term.
    * Output: (idCol, term, tfidf, rk). */
  def topTerms(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("tfidf_raw").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf_raw", col("tf") * log(col("n") / col("df")))
      .withColumn("rk", row_number().over(byDoc))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tfidf_raw").as("tfidf"), col("rk"))
  }
}
