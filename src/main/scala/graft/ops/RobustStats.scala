package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) outlier detection per group.
  *
  * Mean/stddev z-scores (see [[Anomaly]]) break down when the outliers
  * themselves inflate the scale estimate; the robust alternative scores
  * against the median and the median absolute deviation. Exact medians
  * need two passes by nature (the deviation is relative to a first-pass
  * statistic):
  *
  *   pass 1 — `groupBy(key).agg(median(value))`, map-side combined,
  *            output bounded by |keys|, broadcast back;
  *   pass 2 — same shape over `abs(value - med)` for the MAD, broadcast
  *            back, then one more keyed aggregation counting exceedances.
  *
  * Every shuffle is on the (low-cardinality) group key and every join is
  * a broadcast of a |keys|-sized table, so the fact table is scanned
  * three times but never shuffled. At 100 TB you would cache the
  * projected two columns between passes; correctness is identical.
  */
object RobustStats {

  /** Per-key median, MAD, and the count of rows with
    * `|value - median| > k * MAD`. */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String, k: Double): DataFrame = {
    val base = df.select(col(keyCol), col(valCol))
    val med = base.groupBy(keyCol)
      .agg(expr(s"median($valCol)").as("med"))
    val dev = base.join(broadcast(med), keyCol)
      .withColumn("_ad", abs(col(valCol) - col("med")))
    val mad = dev.groupBy(keyCol)
      .agg(expr("median(_ad)").as("mad"))
    dev.join(broadcast(mad), keyCol)
      .groupBy(keyCol)
      .agg(
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("_ad") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("outliers"))
  }
}
