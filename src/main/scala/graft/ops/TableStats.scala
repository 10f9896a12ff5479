package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass ANALYZE: per-column min / max / null count plus an HLL NDV
  * estimate for every requested column, computed in ONE aggregation job.
  *
  * The reference computes column stats one scan at a time — `minMaxScale`
  * re-aggregates per feature (`Transformation.scala:53-57`) and
  * `countCastFailures` re-scans per column (`Cleaning.scala:104-106`);
  * at 100 TB each extra pass is the whole table bill again. Here every
  * column's four statistics ride the same partial→final hash aggregate,
  * so a 50-column ANALYZE costs exactly one scan, and the NDV uses
  * `approx_count_distinct` (HyperLogLog++) — a mergeable sketch — instead
  * of `count(distinct)`, whose multi-column form forces Catalyst into an
  * `Expand` that multiplies the scanned rows by the number of distinct
  * aggregates.
  *
  * Output is LONG format (one row per column), exploded from the single
  * aggregated row — never collected to the driver, so the
  * result composes with joins/sinks like any other frame. min/max are
  * rendered as strings so heterogeneous column types share one schema
  * (the same choice parquet footers and engine catalogs make for
  * cross-type stats storage).
  *
  * These are exactly the inputs a cost-based planner wants: `row_count`
  * and `ndv_est` drive join-side broadcast decisions and
  * pre-aggregation-vs-direct-shuffle choices; `null_count` decides
  * whether a null-skew salt is worth it.
  */
object TableStats {

  /** Collect stats for `cols` in one aggregation pass. Returns
    * (column, min_s, max_s, null_count, ndv_est, row_count) — one row per
    * requested column, in the requested order.
    */
  def collect(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "TableStats.collect: no columns")
    val aggs = count(lit(1)).as("__rows") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        approx_count_distinct(col(c)).as(s"__ndv_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Long format without a driver collect: explode the wide row back into
    // one row per column (names enter as literal Columns, never spliced
    // into SQL text, so any column name round-trips).
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column"),
        col(s"__min_$i").as("min_s"),
        col(s"__max_$i").as("max_s"),
        col(s"__nulls_$i").as("null_count"),
        col(s"__ndv_$i").as("ndv_est"),
        col("__rows").as("row_count"))
    }
    one.select(explode(array(entries: _*)).as("s")).select("s.*")
  }

  /** Columns whose NDV estimate covers (almost) every row — unique-key
    * candidates for clustering / bucketing / upsert keys. `tolerance`
    * absorbs HLL relative error (default rsd 5%; 0.15 ≈ a 3-sigma band, so
    * a true key is kept while a 2-rows-per-key column is still excluded). */
  def uniqueKeyCandidates(stats: DataFrame, tolerance: Double = 0.15): DataFrame =
    stats.filter(
      col("null_count") === 0L &&
        col("ndv_est").cast("double") >= col("row_count").cast("double") * (1.0 - tolerance))
}
