package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step that turns
  * near-duplicate PAIRS (MinHash/SimHash/embedding candidates) into
  * duplicate GROUPS so a pipeline can keep one representative per group.
  *
  * Min-label propagation as a Pregel-style driver loop of keyed
  * aggregations: every node starts labeled with its own id; each round,
  * every node takes the min of its label and its neighbors' labels. All
  * data movement is `groupBy(id).min` shuffles on the node key — no
  * driver-side graph, no cross product — so a round costs one shuffle of
  * the edge relation. Rounds needed = component diameter: near-dup
  * clusters are star-/clique-shaped (diameter ≤ ~3), so the loop
  * converges in a handful of rounds; `maxIter` caps pathological chains.
  *
  * Lineage is truncated every round (`localCheckpoint`) — without it the
  * plan doubles per iteration and planning time, not data, becomes the
  * bottleneck. On a cluster, reliable `checkpoint` to the DFS gives the
  * same truncation with fault tolerance.
  */
object ConnectedComponents {

  /** Label every node of the (undirected) edge set with the smallest node
    * id reachable from it. Input: two-column DataFrame (src, dst).
    * Output: (id, comp). Nodes are exactly those appearing in an edge.
    *
    * @return the labeling plus the number of rounds it took (for specs /
    *         monitoring; `rounds == maxIter` means possibly unconverged).
    */
  def label(edges: DataFrame, maxIter: Int = 20): (DataFrame, Int) = {
    val Seq(srcCol, dstCol) = edges.columns.toSeq.take(2)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // Symmetric closure once; propagation then only needs src->dst flow.
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
        .union(labels)
        .groupBy("id")
        .agg(min("comp").as("comp"))
        .localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .isEmpty
      labels = next
      rounds += 1
    }
    (labels, rounds)
  }
}
