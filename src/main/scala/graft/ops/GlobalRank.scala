package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{SortOrder => CatalystSortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Distributed global ranking (VERDICT r1 item 1).
  *
  * `Window.orderBy(...)` with no partition spec moves ALL rows through one
  * task — fine for bounded inputs (year rows, daily aggregates), wrong for
  * anything that grows with the data (ref `Cleaning.scala:68` has the same
  * bug on the full reading set; SURVEY §2.5 flags it). This helper computes
  * the same global `row_number` in a distributed two-pass shape:
  *
  *  1. bucket every row by percentile bounds of the leading order column
  *     (bounds come from one tiny `percentile_approx` aggregate; the bucket
  *     id is a pure function of the row value + literal bounds, so it is
  *     deterministic under recomputation — no reliance on the range
  *     partitioner's sampling or on exchange reuse for correctness);
  *  2. rank locally per bucket (`Window.partitionBy(_bkt)` — distributed),
  *     and stitch with per-bucket row-count offsets. The offset table has
  *     at most `buckets` rows — O(cluster), not O(data) — so its own
  *     cumulative window is legitimately unpartitioned.
  *
  * Requires a TOTAL order (unique tie-break) — the engine's determinism
  * policy already mandates one everywhere. Under a unique order,
  * `rank`/`dense_rank` equal `row_number`, `percent_rank` is
  * `(rn-1)/(N-1)` and `cume_dist` is `rn/N`, so the whole analytic set
  * derives from `_grn`/`_total`.
  *
  * Buckets with equal leading-order values never split across bounds
  * (strict `>=` cutoffs), so bucket order respects the total order even
  * with ties on the leading column. A heavily-skewed leading column
  * collapses buckets (duplicate bounds → empty buckets) — at that point
  * salt on the tie-break column; not needed for the fixture shapes.
  */
object GlobalRank {

  /** PRECONDITION: `orderFirst` must be a bare ASCENDING value expression
    * (`col("x")`, `expr("a+b")`), never `col("x").desc` — the bucket id is
    * "count of bounds <= value", which only lines up with the per-bucket
    * window when both ascend. Descending SortOrder inputs are rejected at
    * call time; to rank descending, negate the value (`-col("x")`) or rank
    * ascending and derive `N + 1 - _grn`. `orderRest` tie-breaks may use
    * any direction — they never cross bucket bounds. */
  private def requireAscending(orderFirst: Column, caller: String): Unit =
    bridge.lower(orderFirst) match {
      case s: CatalystSortOrder => throw new IllegalArgumentException(
        s"GlobalRank.$caller: orderFirst must be a bare ascending value expression, " +
          s"got SortOrder(${s.direction}); negate the value to rank descending")
      case _ => ()
    }

  /** Bucket id = number of bounds <= value. A when-chain (codegen'd, no
    * interpreted lambda); O(buckets) comparisons per row — for thousands of
    * buckets switch to a broadcast range join. */
  private def bucketCol(first: Column, bounds: Seq[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else bounds.map(b => when(first >= lit(b), 1).otherwise(0)).reduce(_ + _)

  /** Adds to `df`:
    *  - `_grn`   global row_number over (orderFirst, orderRest*)
    *  - `_total` total row count
    *  - `_lrn`, `_cnt`, `_bkt` bucket internals (for lead stitching)
    *  - `_next_first` (only if `leadCol` is set): value of `leadCol` on the
    *    first row of the NEXT non-empty bucket — lets callers compute a
    *    global `lead(leadCol, 1)` as bucket-local lead + boundary patch.
    *
    * Cost: one tiny bounds aggregate, one keyed shuffle for the local
    * window, one tiny per-bucket count aggregate broadcast back. Drop the
    * internals with [[dropInternal]].
    */
  /** Percentile cutoffs of the leading order column — one tiny aggregate. */
  private def boundsFor(df: DataFrame, orderFirst: Column, buckets: Int): Seq[Double] = {
    val probs = (1 until buckets).map(_.toDouble / buckets)
    if (probs.isEmpty) Nil
    else {
      val row = df
        .agg(percentile_approx(
          orderFirst.cast("double"), array(probs.map(lit): _*), lit(10000)).as("b"))
        .head()
      if (row.isNullAt(0)) Nil else row.getSeq[Double](0)
    }
  }

  def ranked(
      df: DataFrame,
      orderFirst: Column,
      orderRest: Seq[Column],
      leadCol: Option[String] = None): DataFrame = {
    requireAscending(orderFirst, "ranked")
    val spark = df.sparkSession
    val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt.max(1)
    val order = orderFirst +: orderRest

    val bounds = boundsFor(df, orderFirst, buckets)

    val bucketed = df.withColumn("_bkt", bucketCol(orderFirst.cast("double"), bounds))
    val bw = Window.partitionBy(col("_bkt")).orderBy(order: _*)
    val local = bucketed.withColumn("_lrn", row_number().over(bw))

    // Per-bucket stats: <= `buckets` rows, so the single-task cumulative
    // window here is bounded by cluster size, not data size.
    val tw = graft.core.Windows.bounded(col("_bkt"))
    val stats = bucketed
      .groupBy(col("_bkt"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn(
        "_off",
        coalesce(sum(col("_cnt")).over(tw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(
        "_total",
        sum(col("_cnt")).over(
          tw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))

    val withNext = leadCol match {
      case Some(c) =>
        val firsts = local
          .filter(col("_lrn") === 1)
          .select(col("_bkt").as("_fb"), col(c).as("_next_first"))
        stats
          .withColumn("_nb", lead(col("_bkt"), 1).over(tw))
          .join(firsts, col("_nb") === col("_fb"), "left")
          .drop("_nb", "_fb")
      case None => stats
    }

    local
      .join(broadcast(withNext), Seq("_bkt"))
      .withColumn("_grn", col("_lrn") + col("_off"))
  }

  def dropInternal(df: DataFrame): DataFrame =
    df.drop("_bkt", "_lrn", "_cnt", "_off", "_total", "_grn", "_next_first",
      "_lsum", "_bsum", "_boff", "_psum")

  /** Adds `_psum` — the EXCLUSIVE prefix sum of `valueCol` (an integral
    * weight; cast to long) over the total order `(orderFirst, orderRest*)`:
    * the sum of all strictly-preceding rows, 0 for the global first row.
    *
    * Same two-pass shape as [[ranked]]: a global running sum via
    * `Window.orderBy` would drag every row through one task; here each
    * bucket computes its local running sum in parallel and the per-bucket
    * totals (≤ `buckets` rows) are cumulated driver-side-small and
    * broadcast back. This is the scale-safe form of the sequential
    * cumulative scan a sequence-packing / offset-assignment pass needs.
    */
  def prefixSum(
      df: DataFrame,
      valueCol: Column,
      orderFirst: Column,
      orderRest: Seq[Column]): DataFrame = {
    requireAscending(orderFirst, "prefixSum")
    val spark = df.sparkSession
    val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt.max(1)
    val order = orderFirst +: orderRest

    val bounds = boundsFor(df, orderFirst, buckets)
    val bucketed = df
      .withColumn("_v", valueCol.cast("long"))
      .withColumn("_bkt", bucketCol(orderFirst.cast("double"), bounds))

    val bw = Window.partitionBy(col("_bkt")).orderBy(order: _*)
    val local = bucketed.withColumn(
      "_lsum",
      coalesce(
        sum(col("_v")).over(bw.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))

    // Per-bucket totals: ≤ `buckets` rows — the single-task cumulative
    // window is bounded by cluster size, not data size (same argument as
    // in ranked()).
    val tw = graft.core.Windows.bounded(col("_bkt"))
    val stats = bucketed
      .groupBy(col("_bkt"))
      .agg(sum(col("_v")).as("_bsum"))
      .withColumn(
        "_boff",
        coalesce(sum(col("_bsum")).over(tw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

    local
      .join(broadcast(stats), Seq("_bkt"))
      .withColumn("_psum", col("_lsum") + col("_boff"))
      .drop("_v")
  }

  /** Exact SQL NTILE(n) from the stitched global row number. */
  def ntileExpr(n: Int): Column = expr(
    s"""CAST(CASE WHEN _grn <= (_total div $n + 1) * (_total % $n)
              THEN (_grn - 1) div (_total div $n + 1)
              ELSE (_total % $n)
                   + (_grn - 1 - (_total % $n) * (_total div $n + 1))
                     div greatest(_total div $n, 1)
         END + 1 AS INT)""")

  /** Global `lead(col, 1)`: bucket-local lead patched at bucket boundaries
    * with the next non-empty bucket's first value (requires `ranked(...,
    * leadCol = Some(c))`). Null on the global last row, like SQL LEAD. */
  def leadExpr(c: String, order: Seq[Column]): Column = {
    val bw = Window.partitionBy(col("_bkt")).orderBy(order: _*)
    when(col("_lrn") < col("_cnt"), lead(col(c), 1).over(bw))
      .otherwise(col("_next_first"))
  }

  /** PERCENT_RANK under a unique total order: (rn-1)/(N-1), 0 for N=1. */
  def percentRankExpr: Column =
    when(col("_total") === 1, lit(0.0))
      .otherwise((col("_grn") - 1).cast("double") / (col("_total") - 1))

  /** CUME_DIST under a unique total order: rn/N. */
  def cumeDistExpr: Column =
    col("_grn").cast("double") / col("_total")
}
