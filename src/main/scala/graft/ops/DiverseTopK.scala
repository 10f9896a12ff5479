package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) —
  * the diversity-aware top-k every eval-set builder and search
  * re-ranker needs: greedily pick the item maximizing
  * `λ·relevance − (1−λ)·max_cosine_to_already_selected`, so the second
  * pick stops being the first pick's near-duplicate.
  *
  * Scale shape: k rounds, each ONE aggregation over the corpus with the
  * selected set shipped as literal columns (k vectors — a few KB, never
  * a join); the argmax is a single max(struct) with id tie-break, so
  * selection is deterministic and layout-proof. Cost k scans — MMR is
  * inherently sequential (pick i+1 depends on pick i); k is small by
  * construction (an eval set, a results page). */
object DiverseTopK {

  /** Select `k` ids from (idCol, embCol: array<double>, relCol). */
  def mmr(
      corpus: DataFrame, idCol: String, embCol: String, relCol: String,
      k: Int, lambda: Double = 0.5): Seq[Long] = {
    require(k >= 1 && lambda >= 0 && lambda <= 1, "k >= 1, lambda in [0,1]")
    val spark = corpus.sparkSession
    var selected = Vector.empty[(Long, Seq[Double])]
    val base = corpus.select(
      col(idCol).cast("long").as("_id"),
      col(embCol).as("_emb"),
      col(relCol).cast("double").as("_rel"))
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
  }
}
