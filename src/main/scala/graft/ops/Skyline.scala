package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Windows

/** 2-D Pareto frontier (skyline) with both dimensions maximized.
  *
  * A row `(x, y)` is on the skyline iff no other row has `x' >= x` and
  * `y' >= y` with at least one strict. The naive formulation is an
  * all-pairs `NOT EXISTS` self-join — quadratic, hopeless at scale. The
  * distributed shape used here reduces the dominance test to two bounded
  * aggregates over the distinct values of `x`:
  *
  *   - `M(x)` = max y among rows with that exact x, and
  *   - `S(x)` = max y among rows with strictly larger x (a suffix max
  *     over the per-x table),
  *
  * because a row `(x, y)` is dominated iff `S(x) >= y` (a dominator with
  * strictly larger x) or `M(x) > y` (a same-x dominator with larger y).
  * Ties on both coordinates are mutually non-dominating and all kept.
  *
  * Cost: one `groupBy(x)` aggregation (map-side combined), one
  * single-task suffix-max window over the AGGREGATED per-x table —
  * bounded by `|distinct x|`, the caller's contract being that x is
  * low-cardinality (an order count, a star rating, a bucketed measure;
  * bucketize a continuous x first) — and one broadcast join back to the
  * input. The fact table is scanned twice but never shuffled on a
  * data-sized key and never self-joined.
  */
object Skyline {

  def maxMax2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(xCol).agg(max(col(yCol)).as("_m"))
    val thresholds = perX.withColumn(
      "_s",
      max(col("_m")).over(
        Windows.bounded(col(xCol).desc)
          .rowsBetween(Long.MinValue, -1)))
    df.join(broadcast(thresholds), xCol)
      .where(
        col(yCol) === col("_m") &&
          (col("_s").isNull || col(yCol) > col("_s")))
      .drop("_m", "_s")
  }
}
