package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity

/** Semantic deduplication over an embedding column — the SemDeDup
  * construction (Abbas et al. 2023, arXiv:2303.09540, public): k-means
  * clusters the corpus, pairwise cosine runs only WITHIN a cluster, pairs
  * above the threshold collapse to one representative. The clustering is
  * what makes semantic dedup tractable at 100 TB: brute-force all-pairs is
  * O(n²); with k clusters the pair space drops to O(n²/k), and k scales
  * with the corpus so per-cluster work stays constant.
  *
  * Scale levers, in the order they matter:
  *  - `nClusters`: grow with the corpus (n/avgClusterSize). The k-means fit
  *    itself runs on a seeded SAMPLE (`fitFraction`) — centroid quality
  *    needs thousands of points per cluster, not the whole corpus; assign
  *    (one broadcast-centroid map pass) still covers every row.
  *  - `maxClusterSize`: oversized cells (k-means always produces a few) are
  *    SUBDIVIDED by a deterministic id-hash, never dropped — each sub-cell
  *    stays under the cap, so no collect_list row can blow an executor.
  *    Pairs across sub-cells of one oversized cell are the (documented)
  *    recall cost, the same trade LSH banding makes.
  *
  * Pair formation mirrors [[Dedup.minhashNearDupPairs]]: buckets collect
  * ONLY ids (the embedding arrays would multiply the shuffle by the
  * cluster width), candidate pairs re-join the vectors, and the fused
  * [[CosineSimilarity]] codegen expression verifies each pair in one loop.
  */
object SemDedup {

  /** Cell assignment: (vec_id, emb, cell). Fit on a seeded sample, assign
    * everything. Input follows [[Ann.prepared]]: (vec_id, emb double[]). */
  def assignCells(
      corpus: DataFrame,
      nClusters: Int,
      seed: Long = 42L,
      fitFraction: Double = 1.0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = corpus.withColumn("__vec", array_to_vector(col("emb")))
    val fitOn =
      if (fitFraction < 1.0) withVec.sample(withReplacement = false, fitFraction, seed)
      else withVec
    val model = new KMeans()
      .setK(nClusters).setSeed(seed).setFeaturesCol("__vec")
      .fit(fitOn)
    model.transform(withVec)
      .select(col("vec_id"), col("emb"), col("prediction").as("cell"))
  }

  /** Semantic near-dup pairs: (a_id, b_id, sim) with sim >= minSim and
    * a_id < b_id, candidates limited to k-means cells (sub-divided past
    * `maxClusterSize`). */
  def nearDupPairs(
      corpus: DataFrame,
      nClusters: Int,
      minSim: Double,
      seed: Long = 42L,
      maxClusterSize: Int = 10000,
      fitFraction: Double = 1.0): DataFrame = {
    val assigned = assignCells(corpus, nClusters, seed, fitFraction)
    // Oversized-cell subdivision: per-cell counts are ≤ nClusters rows —
    // broadcast them back, then hash each id into one of ceil(n/cap)
    // sub-cells. Cells under the cap get nsub=1 (sub=0 for every row), so
    // the common case is untouched.
    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("__n"))
    val sub = assigned
      .join(broadcast(counts), Seq("cell"))
      .withColumn("__nsub", ceil(col("__n") / lit(maxClusterSize.toDouble)).cast("int"))
      .withColumn("sub", pmod(xxhash64(col("vec_id")), col("__nsub")).cast("int"))
    val buckets = sub
      .groupBy("cell", "sub")
      .agg(collect_list(col("vec_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
    val candidates = buckets
      .select(explode(col("ids")).as("a_id"), col("ids"))
      .select(col("a_id"), explode(col("ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
    val embs = corpus.select(col("vec_id"), col("emb"))
    candidates
      .join(embs.select(col("vec_id").as("a_id"), col("emb").as("a_emb")), Seq("a_id"))
      .join(embs.select(col("vec_id").as("b_id"), col("emb").as("b_emb")), Seq("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        round(CosineSimilarity(col("a_emb"), col("b_emb")), 6).as("sim"))
      .filter(!isnan(col("sim")) && col("sim") >= minSim)
  }

  /** Keep one representative (the smallest id) per duplicate GROUP: pairs
    * → connected components (A~B, B~C ⇒ one group even if A~C was never a
    * candidate), everything but each component's min id is dropped. */
  def representatives(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val (labels, _) = ConnectedComponents.label(pairs.select("a_id", "b_id"))
    val losers = labels
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("vec_id"))
    corpus.join(losers, Seq("vec_id"), "left_anti")
  }

  /** The full SemDeDup pass: cluster → within-cell pairs → keep-one. */
  def dedup(
      corpus: DataFrame,
      nClusters: Int,
      minSim: Double,
      seed: Long = 42L,
      maxClusterSize: Int = 10000,
      fitFraction: Double = 1.0): DataFrame =
    representatives(
      corpus,
      nearDupPairs(corpus, nClusters, minSim, seed, maxClusterSize, fitFraction))
}
