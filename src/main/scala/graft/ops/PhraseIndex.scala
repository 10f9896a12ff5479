package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase retrieval — the IR rung
  * above [[graft.queries.Text]]'s q220 posting lists (which carry only
  * frequencies): with token POSITIONS indexed, "exact phrase" queries
  * resolve from the index alone, never by rescanning text.
  *
  * Phrase matching is ONE keyed aggregation regardless of phrase
  * length: each posting whose term appears at phrase offset(s) idx emits
  * (doc, pos − idx, idx); a phrase of k terms occurs at anchor a iff the
  * (doc, a) group holds all k distinct offsets. A term repeated inside
  * the phrase just emits one row per offset — no special case. Scale
  * shape: the phrase's term→offset table broadcasts (it is phrase-sized),
  * only postings of the phrase's terms survive the join, and the single
  * shuffle is keyed on (doc, anchor) — cost tracks the queried terms'
  * posting lists, exactly how a shard-by-term index answers phrases.
  */
object PhraseIndex {

  /** Positional postings: (term, doc_id, pos), pos 1-based over
    * whitespace tokens. Shard/layout by term for retrieval at scale. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), posexplode(split(col(textCol), " ")).as(Seq("p0", "term")))
      .select(col("term"), col("doc_id"), (col("p0") + 1).as("pos"))

  /** Every occurrence of `phrase` (consecutive tokens) as (doc_id,
    * anchor) — anchor is the 1-based position of the phrase's first
    * token. Overlapping occurrences all report. */
  def phraseOccurrences(post: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val spark = post.sparkSession
    import spark.implicits._
    val offsets = phrase.zipWithIndex.map { case (w, i) => (w, i.toLong) }
      .toDF("term", "idx")
    post.join(broadcast(offsets), Seq("term"))
      .groupBy(col("doc_id"), (col("pos") - col("idx")).as("anchor"))
      .agg(countDistinct(col("idx")).as("_k"))
      .filter(col("_k") === phrase.size.toLong)
      .select("doc_id", "anchor")
  }
}
