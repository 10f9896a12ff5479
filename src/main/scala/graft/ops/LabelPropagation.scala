package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et al.
  * 2007, arXiv:0709.2938) — the soft counterpart of
  * [[ConnectedComponents]]: where components answer "which docs are
  * transitively linked at all", label propagation groups nodes by DENSE
  * neighborhoods, splitting a chain of weak bridges that components would
  * merge.
  *
  * Determinism (the property the oracle needs and vanilla LPA lacks):
  *   - SYNCHRONOUS rounds — every round-t+1 label is computed from the
  *     full round-t labeling, so there is no update-order dependence;
  *   - a SELF-VOTE — each node votes for its own current label alongside
  *     its neighbors' — which breaks the classic two-coloring oscillation
  *     of synchronous LPA (an isolated edge {a,b} swaps labels forever
  *     without it; with it, both sides tie on {a,b} and the tie-break
  *     settles them);
  *   - a total tie-break: highest vote count, then SMALLEST label.
  *
  * A FIXED iteration count (caller-chosen) rather than a convergence
  * probe keeps the result a pure function of (edges, iters) — exactly
  * reproducible, and exactly mirrorable by unrolled SQL.
  *
  * Scale shape, per round: one join of the symmetric edge list against
  * the current ≤-node-count labeling, one (node, label)-keyed count, one
  * node-keyed arg-max — all keyed shuffles of edge/node-sized relations,
  * no driver-side graph, no cross product. Both loop relations are
  * frozen hash-partitioned on the join key so the edge side shuffles
  * once at setup, not once per round; lineage is truncated every round
  * (`localCheckpoint`) so plan size stays constant.
  */
object LabelPropagation {

  /** Label the nodes of the undirected edge set (first two columns =
    * src, dst). Returns (id, label) with one row per distinct endpoint;
    * self-loops add a vote for the node's own label (harmless — the
    * self-vote already exists) and isolated self-loop nodes keep their
    * own id. */
  def run(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val spark = edges.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val Seq(srcCol, dstCol) = edges.columns.toSeq.take(2)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // symmetric closure, frozen hash-partitioned on dst (the per-round
    // join key against the labeling) — shuffled once, reused every round
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(parts, col("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .repartition(parts, col("id"))
      .localCheckpoint()

    var labels = nodes.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val neighborVotes = sym
        .join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("vid"), col("label"))
      val selfVotes = labels.select(col("id").as("vid"), col("label"))
      // arg-max by (count desc, label asc) WITHOUT a window: max of
      // (cnt, -label) structs stays in whole-stage HashAggregate
      labels = neighborVotes.union(selfVotes)
        .groupBy(col("vid"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("vid"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("vid").as("id"), (-col("m.nl")).as("label"))
        .repartition(parts, col("id"))
        .localCheckpoint()
    }
    labels
  }
}
