package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Composed corpus-cleaning pipeline (the end-to-end shape a training-data
  * user runs over raw documents): token-length gate → lexical-diversity
  * gate → exact dedup keeping the smallest id.
  *
  * Single-pass: the dedup is a `min(id) over (partition by digest)` window
  * rather than a groupBy + semi-join, so the gated subtree is scanned once
  * and the only shuffle is the digest window (fixed-width key).
  */
object Corpus {
  def clean(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minTokens: Int = 30,
      maxTokens: Int = 400,
      minTtr: Double = 0.4): DataFrame = {
    val gated = docs
      .filter(TextFunctions.tokenCount(col(textCol)).between(minTokens, maxTokens))
      .filter(TextFunctions.typeTokenRatio(col(textCol)) > minTtr)
    val byDigest = Window.partitionBy(sha2(col(textCol), 256))
    gated
      .withColumn("__keep", min(col(idCol)).over(byDigest))
      .filter(col(idCol) === col("__keep"))
      .drop("__keep")
  }
}
