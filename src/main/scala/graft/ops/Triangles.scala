package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting via degree-ordered edge orientation — the
  * classic scale-safe formulation (Suri & Vassilvitskii, WWW'11 — the
  * MapReduce original; same shape as GraphX's TriangleCount): orient
  * every undirected edge from its (degree, id)-smaller endpoint to the
  * larger, enumerate directed wedges a→b, a→c from each node's
  * out-neighborhood, and close them against the edge set. Every
  * triangle is counted EXACTLY once (its unique minimum-(degree, id)
  * corner generates the wedge).
  *
  * Why orientation matters at 100 TB: a naive wedge count explodes on
  * hubs (Σ deg(v)² — one celebrity node with 10M neighbors makes 10¹⁴
  * wedges). After degree orientation, out-degree is bounded by O(√E)
  * for ANY graph, so wedge volume is at most E^{3/2} spread evenly
  * across keyed shuffles — the hub generates nothing; its low-degree
  * neighbors each generate a handful.
  *
  * Shuffles: dedup to canonical edges (one), degree count (one),
  * orientation join (keyed), self-join on the wedge apex (keyed),
  * closing join on the canonical edge (keyed). Nothing global, nothing
  * driver-sized. */
object Triangles {

  /** Canonical undirected edges from ANY (a, b) pair column input:
    * self-loops dropped, (u, v) with u < v, deduplicated. */
  private def canonical(edges: DataFrame): DataFrame = {
    val a = col(edges.columns(0)); val b = col(edges.columns(1))
    edges
      .select(least(a, b).as("u"), greatest(a, b).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
  }

  /** Degree-oriented directed edges: src is the (degree, id)-smaller
    * endpoint. */
  private def oriented(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    und
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("dst"))
  }

  /** Total triangle count. */
  def count(edges: DataFrame): Long = {
    val und = canonical(edges).cache()
    try {
      val o = oriented(und)
      val e1 = o.select(col("src"), col("dst").as("x"))
      val e2 = o.select(col("src"), col("dst").as("y"))
      val wedges = e1.join(e2, Seq("src")).filter(col("x") < col("y"))
      wedges
        .join(und,
          least(col("x"), col("y")) === col("u") &&
            greatest(col("x"), col("y")) === col("v"))
        .count()
    } finally { und.unpersist(); () }
  }

  /** Per-node triangle participation: one row per node appearing in at
    * least one triangle, with the number of triangles through it. */
  def perNode(edges: DataFrame): DataFrame = {
    val und = canonical(edges)
    val o = oriented(und)
    val e1 = o.select(col("src"), col("dst").as("x"))
    val e2 = o.select(col("src"), col("dst").as("y"))
    val tris = e1.join(e2, Seq("src")).filter(col("x") < col("y"))
      .join(und,
        least(col("x"), col("y")) === col("u") &&
          greatest(col("x"), col("y")) === col("v"))
      .select(col("src"), col("x"), col("y"))
    tris
      .select(explode(array(col("src"), col("x"), col("y"))).as("node"))
      .groupBy("node")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
  }
}
