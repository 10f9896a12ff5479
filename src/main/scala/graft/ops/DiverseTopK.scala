package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) —
  * the diversity-aware top-k every eval-set builder and search
  * re-ranker needs: greedily pick the item maximizing
  * `λ·relevance − (1−λ)·max_cosine_to_already_selected`, so the second
  * pick stops being the first pick's near-duplicate.
  *
  * Scale shape: k rounds, each ONE aggregation with the selected set
  * shipped as literal columns (k vectors — a few KB, never a join); the
  * argmax is a single max(struct) with id tie-break, so selection is
  * deterministic and layout-proof. MMR is inherently sequential (pick
  * i+1 depends on pick i), so the cost envelope is k scans of whatever
  * the rounds iterate over:
  *
  *   - `shortlist = 0` (exact): k FULL corpus scans — Θ(k·n). Fine for
  *     fixture-sized corpora; at 100 TB the k re-scans are the
  *     bottleneck, not the math.
  *   - `shortlist = N > 0`: ONE relevance top-N pass
  *     (TakeOrderedAndProject — per-partition top-N, merge on the
  *     driver's single result stage, never a global sort shuffle) is
  *     cached, and the k rounds scan the N-row shortlist — Θ(n + k·N).
  *     This is the standard retrieve-then-rerank contract: items
  *     outside the relevance top-N can never be selected, which is the
  *     point (a low-relevance outlier is not wanted diversity). With
  *     `N ≥ corpus size` the result is IDENTICAL to exact
  *     (spec-pinned); in production pick N ∈ [10k, 100k] so the rerank
  *     loop runs over an executor-cached sliver of the corpus.
  */
object DiverseTopK {

  /** Select `k` ids from (idCol, embCol: array<double>, relCol).
    * `shortlist > 0` bounds the rerank pool to the relevance top-N
    * (see the cost envelope above). */
  def mmr(
      corpus: DataFrame, idCol: String, embCol: String, relCol: String,
      k: Int, lambda: Double = 0.5, shortlist: Int = 0): Seq[Long] = {
    require(k >= 1 && lambda >= 0 && lambda <= 1, "k >= 1, lambda in [0,1]")
    require(shortlist == 0 || shortlist >= k,
      s"shortlist=$shortlist cannot be smaller than k=$k")
    val base0 = corpus.select(
      col(idCol).cast("long").as("_id"),
      col(embCol).as("_emb"),
      col(relCol).cast("double").as("_rel"))
    val base =
      if (shortlist <= 0) base0
      // one top-N relevance pass (deterministic id tie-break), cached so
      // the k rounds scan the N-row pool instead of the corpus
      else base0.orderBy(col("_rel").desc, col("_id")).limit(shortlist).cache()
    try {
      var selected = Vector.empty[(Long, Seq[Double])]
      while (selected.size < k) {
        val remaining = base.filter(!col("_id").isInCollection(
          if (selected.isEmpty) Seq(-1L) else selected.map(_._1)))
        val maxSim =
          if (selected.isEmpty) lit(0.0)
          else {
            val sims = selected.map { case (_, e) =>
              graft.functions.CosineSimilarity(col("_emb"), typedLit(e))
            }
            if (sims.size == 1) sims.head else greatest(sims: _*)
          }
        val pick = remaining
          .select(struct(
            (lit(lambda) * col("_rel") - lit(1 - lambda) * maxSim).as("score"),
            (-col("_id")).as("negId"),
            col("_id"), col("_emb")).as("s"))
          .agg(max(col("s")).as("m"))
          .select(col("m._id"), col("m._emb"))
          .collect()
        if (pick.isEmpty || pick(0).isNullAt(0)) return selected.map(_._1)
        selected :+= ((pick(0).getLong(0), pick(0).getSeq[Double](1)))
      }
      selected.map(_._1)
    } finally if (shortlist > 0) base.unpersist()
  }
}
