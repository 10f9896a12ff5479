package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 retrieval over a document corpus — the relevance primitive behind
  * query-based corpus filtering ("keep documents that look like the
  * benchmark topic") and retrieval-augmented dataset construction.
  *
  * Plan shape at 100 TB: one narrow pass explodes tokens and filters to
  * the (tiny) query term set BEFORE any shuffle — the inverted-index
  * slice for the query — so the keyed aggregations run over |matching
  * postings|, not the corpus token count. Per-document lengths aggregate
  * once from the full token stream (that pass is corpus-sized but
  * shuffle-light: one long per doc); `avgdl` and the per-term document
  * frequencies are single-row/tiny side outputs joined back by broadcast.
  * Nothing is ever driver-collected.
  *
  * Scoring is the standard published formula (Robertson/Sparck Jones):
  * idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf-saturation k1, length
  * normalization b.
  */
object Bm25 {

  /** Top-k docs for `terms`. Output: (doc_id, score) — score rounded to 6
    * decimals, ties broken by doc_id, fully deterministic. */
  def topDocs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    // Corpus-wide statistics: doc lengths (one row per doc), their mean,
    // and the corpus size. dl is also the postings' join partner below.
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      avg(col("dl")).as("avgdl"),
      count(lit(1)).as("n_docs"))
    // Inverted-index slice: only postings of the query terms survive the
    // narrow filter, so everything downstream is query-sized.
    val postings = toks.filter(col("term").isin(terms: _*))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val df_ = postings.groupBy("term").agg(count(lit(1)).as("df"))
    postings
      .join(broadcast(df_), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // one row: avgdl + N
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }
}
