package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the link-graph quality
  * signal of web-corpus curation (rank hosts/URLs by the crawl graph,
  * keep the head, drop spam tails; the published crawl pipelines pair a
  * link-centrality signal with the content-quality filters this engine
  * already ships: q123/q148 LM scores, Gopher-style heuristics).
  *
  * Semantics: the classic un-normalized power iteration
  * (Brin & Page 1998 as popularized by every dataflow implementation):
  *
  *   PR_0(v)     = 1.0
  *   PR_t+1(v)   = (1 − d) + d · Σ_{(u,v) ∈ E} PR_t(u) / outdeg(u)
  *
  * A FIXED `iterations` count, so the result is deterministic arithmetic
  * — oracle-checkable cross-engine (q149 unrolls the same recurrence in
  * SQL). Dangling nodes (no out-edges) receive rank but leak their mass,
  * exactly as in the canonical dataflow formulation — fine for a
  * RANKING signal, which is how curation uses it.
  *
  * Shuffle budget (the [[ConnectedComponents]] loop discipline):
  *   - edges are materialized ONCE (Observation carries the count for
  *     loop sizing — no separate job), out-degrees join in once, and the
  *     weighted link relation is FROZEN hash-partitioned on `src` at an
  *     explicit width: the per-round contribution join is exchange-free
  *     on the edge side — the big relation shuffles once at setup, not
  *     once per round;
  *   - per round, only the node-sized contribution relation shuffles
  *     (one keyed agg on `dst`, explicitly re-laid to the SAME width/key
  *     layout so the merge join with the frozen node relation adds no
  *     exchange);
  *   - every round checkpoints (lineage truncation; layout survives).
  *
  * Loop width scales with the GRAPH and is capped by the session
  * (`spark.graft.pagerank.loopRowsPerPartition` overrides the 4M-row
  * default) — small post-blocking graphs collapse to a few partitions
  * instead of paying session-width scheduling per round.
  */
object PageRank {

  /** (id, rank) for every node of `edges` (first two columns = src, dst;
    * duplicate edges collapse) after `iterations` rounds. */
  def rank(
      edges: DataFrame,
      damping: Double = 0.85,
      iterations: Int = 10,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val spark = edges.sparkSession
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        df => {
          val sc = spark.sparkContext
          val prev = sc.getCheckpointDir
          sc.setCheckpointDir(dir)
          try df.checkpoint()
          finally prev.filter(_ != dir).foreach(sc.setCheckpointDir)
        }
      case None => df => df.localCheckpoint()
    }
    val Seq(srcCol, dstCol) = edges.columns.toSeq.take(2)
    val eObs = Observation()
    val e = ckpt(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
        .observe(eObs, count(lit(1)).as("n")))
    val nEdges = eObs.get.get("n") match {
      case Some(n: Number) => n.longValue()
      case _               => 0L
    }
    val rowsPerPartition = spark.conf
      .getOption("spark.graft.pagerank.loopRowsPerPartition")
      .map(_.toLong).getOrElse(4L << 20)
    val loopParts = ConnectedComponents.loopWidth(
      nEdges, spark.conf.get("spark.sql.shuffle.partitions").toInt, rowsPerPartition)
    // weighted links: one out-degree agg, one join, then frozen on src
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val links = ckpt(
      e.join(outdeg, "src")
        .select(col("src"), col("dst"), (lit(1.0) / col("od")).as("w"))
        .repartition(loopParts, col("src")))
    val nodes = ckpt(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
        .repartition(loopParts, col("id")))
    var ranks = ckpt(nodes.withColumn("rank", lit(1.0)))
    var round = 0
    while (round < iterations) {
      val contrib = links
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .groupBy("dst")
        .agg(sum(col("w") * col("rank")).as("inflow"))
        .repartition(loopParts, col("dst")) // align with the frozen node layout
      val next = nodes
        .join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      ranks = ckpt(next)
      round += 1
    }
    ranks
  }
}
