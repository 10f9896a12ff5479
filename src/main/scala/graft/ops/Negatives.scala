package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative-pair sampling for contrastive training data
  * (in-batch negatives are biased by batch composition; corpus-level
  * pipelines pre-materialize k uniform negatives per anchor instead).
  *
  * For each document and j ∈ [0, k): draw a pseudo-random partner,
  * uniform over the OTHER n−1 documents, purely from a salted md5 of
  * (anchor id, j) — no RNG state, so the sample is reproducible row-by-row
  * under retries, repartitioning, and speculative execution, exactly like
  * the engine's hash split ([[graft.queries.TrainPrep]] q110).
  *
  * Shape: ids → scale-safe global rank ([[GlobalRank]], never an
  * unpartitioned window) → candidate rank = md5₄₈(seed, id, j) mod (n−1)
  * with the classic skip-self shift (cand ≥ selfRank → cand+1) → one
  * keyed join back from rank to document id. The 48-bit prefix draw
  * (same as q141's epoch shuffle) makes the modulo bias ≤ (n−1)/2⁴⁸ —
  * negligible up to trillions of documents, though not exactly uniform.
  * Cost: GlobalRank's two bounded passes + one shuffle join on the
  * rank — k is a row multiplier, not a join blowup. */
object Negatives {

  /** (doc_id, j, neg_id) for j ∈ [0, k). A single-row corpus errors the
    * job (the in-plan guard below — one row has no possible partner); an
    * EMPTY corpus yields an empty result without error (per-row asserts
    * never evaluate, and no anchors means no pairs is the right answer). */
  def negativePairs(
      df: DataFrame, idCol: String, k: Int, seed: String = "neg-v1"): DataFrame = {
    require(k >= 1, "k must be positive")
    val ids = df.select(col(idCol).cast("long").as("doc_id"))
    val ranked = GlobalRank.ranked(ids, col("doc_id"), Nil)
      .select(col("doc_id"), (col("_grn") - 1).as("rnk"), col("_total").as("n"))
    val h = conv(
      substring(
        md5(concat(
          lit(s"$seed:"), col("doc_id").cast("string"),
          lit(":"), col("j").cast("string"))),
        1, 12),
      16, 10).cast("long")
    // the >= 2 rows precondition is enforced IN the plan (zero extra
    // passes): assert_true yields null when the guard holds, errors the
    // job otherwise — n - 1 = 0 would silently drop every row via the
    // null modulo + join below
    val guard = coalesce(
      assert_true(col("n") >= 2,
        lit("Negatives.negativePairs requires >= 2 rows")).cast("long"),
      lit(0L))
    val cands = ranked
      .select(col("doc_id"), col("rnk"), col("n"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("cand", (h + guard) % (col("n") - 1))
      .withColumn("neg_rank",
        when(col("cand") >= col("rnk"), col("cand") + 1).otherwise(col("cand")))
    cands
      .join(ranked.select(col("rnk").as("neg_rank"), col("doc_id").as("neg_id")),
        Seq("neg_rank"))
      .select(col("doc_id"), col("j"), col("neg_id"))
  }
}
