package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed token co-occurrence with pointwise mutual information — the
  * classic corpus-association score (Church & Hanks, CL 1990): for an
  * unordered token pair (x, y) co-occurring within a ±window span,
  * PMI = ln( p(x,y) / (p(x)·p(y)) ), estimated from pair and unigram
  * frequencies. High-PMI pairs surface collocations ("new york") and
  * template artifacts — a boilerplate/quality signal for a training
  * corpus.
  *
  * Scale shape: tokens explode with their positions (rows ∝ corpus
  * tokens), pairs come from a POSITION-BANDED self-join per document
  * (each token pairs with at most `window` successors — volume is
  * window·T, never T²), and everything aggregates on token/pair keys.
  * The only driver-side values are the two scalar totals (token count,
  * pair count). PMI arithmetic stays in EXACT integer products
  * (c·T², P·cₓ·c_y — both < 2⁵³ for any corpus this engine meets in
  * one partition-group) cast to double only for the final division, so
  * the score is bit-deterministic across engines. */
object Cooccurrence {

  /** Unordered within-`window` pair PMI scores.
    * @return (w1, w2, c_pair, pmi) with w1 <= w2, pairs below
    *         `minPairCount` dropped. */
  def pmi(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, minPairCount: Long): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("i", "tok")))
      .filter(col("tok") =!= "")
    val totalTokens = toks.count()
    val a = toks.select(col("doc_id"), col("i"), col("tok").as("ta"))
    val b = toks.select(col("doc_id"), col("i").as("j"), col("tok").as("tb"))
    val pairs = a.join(b, Seq("doc_id"))
      .filter(col("j") - col("i") >= 1 && col("j") - col("i") <= window)
      .select(
        least(col("ta"), col("tb")).as("w1"),
        greatest(col("ta"), col("tb")).as("w2"))
    val totalPairs = pairs.count()
    val pairCounts = pairs.groupBy("w1", "w2")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minPairCount)
    val uni = toks.groupBy("tok")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("c_tok"))
    pairCounts
      .join(uni.select(col("tok").as("w1"), col("c_tok").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c_tok").as("c2")), "w2")
      .select(
        col("w1"), col("w2"), col("c_pair"),
        log(
          (col("c_pair") * lit(totalTokens) * lit(totalTokens)).cast("double") /
            (lit(totalPairs) * col("c1") * col("c2")).cast("double"))
          .as("pmi"))
  }
}
