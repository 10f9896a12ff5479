package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core extraction (Seidman 1983): repeatedly peel nodes of degree
  * < k until the remainder is a fixpoint — the standard "dense enough
  * to matter" filter before community detection or influence analysis,
  * and the graph-side analogue of the dedup family's cluster pruning.
  *
  * Scale shape: each peel round is two keyed aggregations (degrees) and
  * two semi-joins back onto the edge list — all keyed on node id, no
  * windows, no driver-side data. The edge list is `localCheckpoint`ed
  * per round (the [[PageRank]] lineage-cut pattern) so the plan does
  * not deepen with rounds. Rounds are bounded by the peel depth
  * (degeneracy ordering depth, ≪ node count in real graphs — document
  * the observed count via the return value); each round's only driver
  * traffic is ONE count. */
object KCore {

  /** Nodes of the k-core with their WITHIN-CORE degrees, plus the number
    * of peel rounds it took: (nodes DataFrame(u, deg), rounds). Expects
    * an undirected edge list with columns (a, b), one row per edge. */
  def kCore(spark: SparkSession, edges: DataFrame, k: Int): (DataFrame, Int) = {
    require(k >= 1, "k must be positive")
    // canonicalize: (a,b) and (b,a) are the SAME undirected edge —
    // without least/greatest normalization a both-orientations input
    // would double-count every degree
    var cur = edges.select(
        least(col("a").cast("long"), col("b").cast("long")).as("a"),
        greatest(col("a").cast("long"), col("b").cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = true)
    var n = cur.count()
    var rounds = 0
    var converged = n == 0L
    while (!converged) {
      val deg = cur.select(col("a").as("u")).union(cur.select(col("b").as("u")))
        .groupBy("u").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("u")
      val next = cur
        .join(keep.select(col("u").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("u").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(eager = true)
      val m = next.count()
      rounds += 1
      converged = m == n // no edge lost => every endpoint already has deg >= k
      cur = next
      n = m
    }
    val coreDeg = cur.select(col("a").as("u")).union(cur.select(col("b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("deg"))
    (coreDeg, rounds)
  }
}
