package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT Jaccard set-similarity self-join via prefix filtering (the
  * AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08):
  * every element pair with set Jaccard ≥ t, with NO false negatives —
  * the exact counterpart of the MinHash/SimHash approximate paths in
  * [[Dedup]].
  *
  * Why it scales: under a global element ordering (rarest first), two
  * sets with Jaccard ≥ t MUST share an element within each other's first
  * `|x| − ⌈t·|x|⌉ + 1` elements — so the candidate join runs on PREFIX
  * elements only (dominated by rare elements with tiny frequency), never
  * on the full posting lists of ubiquitous ones. Candidates then pass a
  * size-ratio filter (t·|x| ≤ |y| ≤ |x|/t) and an exact intersection
  * count. Every stage is a keyed shuffle: element frequency, per-set
  * rank windows (bounded by set size), prefix equi-join, pair-keyed
  * intersection count.
  *
  * The caller supplies the (id, w) element table — unigrams, shingles,
  * whatever defines "similar". The correctness gate is the strongest
  * available: the DuckDB oracle computes ALL qualifying pairs from the
  * full quadratic join, so one false negative from the prefix filter
  * hash-fails the query.
  */
object SetSimJoin {

  /** @param tok distinct (id, w) element rows (duplicates are deduped) */
  def selfJoin(tok0: DataFrame, threshold: Double): DataFrame = {
    val tok = tok0.select(col("id"), col("w")).distinct()
    val freq = tok.groupBy("w").agg(count(lit(1)).as("df"))
    val perSet = Window.partitionBy("id")
    val ordered = tok.join(freq, "w")
      .withColumn("r", row_number().over(perSet.orderBy(col("df"), col("w"))))
      .withColumn("sz", count(lit(1)).over(perSet))
    val prefix = ordered
      .filter(col("r") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("id"), col("w"), col("sz"))
    val cand = prefix.as("a").join(prefix.as("b"), Seq("w"))
      .filter(col("a.id") < col("b.id"))
      .filter(
        col("a.sz") * lit(threshold) <= col("b.sz") &&
          col("b.sz") * lit(threshold) <= col("a.sz"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .distinct()
    cand
      .join(tok.select(col("id").as("id_a"), col("w")), "id_a")
      .join(tok.select(col("id").as("id_b"), col("w")), Seq("id_b", "w"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jac", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("jac"))
  }

  /** Word n-gram shingle elements for [[selfJoin]]: one row per distinct
    * shingle of `n` consecutive space-split words. Sets under shingles
    * capture phrasing, not vocabulary — random texts over a shared
    * dictionary score near 0 while true near-duplicates score near 1. */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= n)
      .select(
        col("id"),
        explode(expr(
          s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', slice(ws, i + 1, $n)))"))
          .as("w"))
}
