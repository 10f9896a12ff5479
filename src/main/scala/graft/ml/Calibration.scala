package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation at corpus scale — the two audits run before a
  * quality gate's threshold goes into a production pipeline:
  *
  *  - [[thresholdSweep]]: precision / recall / F1 at a grid of cutoffs,
  *    ALL cutoffs from ONE aggregation pass (each threshold is a pair of
  *    conditional counts, fused into the same scan — never a pass per
  *    threshold).
  *  - [[reliability]]: the calibration curve + expected calibration
  *    error (ECE) — per probability bin, predicted mean vs empirical
  *    positive rate; ECE is the row-count-weighted |gap|. One keyed
  *    aggregation on the bin; the curve is bins-sized, never data-sized.
  *
  * Both take (label ∈ {0,1}, prob ∈ [0,1]) columns and are pure
  * aggregations — no collect of data-sized state, stream-compatible in
  * foreachBatch form.
  */
object Calibration {

  /** (threshold, tp, fp, fn, precision, recall, f1) per cutoff, one scan
    * total. Degenerate cutoffs (no predicted positives / no actual
    * positives) report 0.0 rather than null so downstream gates compare
    * numerically. */
  def thresholdSweep(
      scored: DataFrame, labelCol: String, probCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "no thresholds")
    val y = col(labelCol).cast("double")
    val p = col(probCol)
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(p >= t && y === 1.0, 1L).otherwise(0L)).as(s"_tp_$i"),
        sum(when(p >= t && y === 0.0, 1L).otherwise(0L)).as(s"_fp_$i"),
        sum(when(p < t && y === 1.0, 1L).otherwise(0L)).as(s"_fn_$i"))
    }
    val one = scored.agg(aggs.head, aggs.tail: _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      s"cast($t as double), `_tp_$i`, `_fp_$i`, `_fn_$i`"
    }
    one
      .select(expr(
        s"stack(${thresholds.size}, ${rows.mkString(", ")}) as (threshold, tp, fp, fn)"))
      .withColumn("precision",
        round(when(col("tp") + col("fp") > 0, col("tp") / (col("tp") + col("fp")))
          .otherwise(0.0), 6))
      .withColumn("recall",
        round(when(col("tp") + col("fn") > 0, col("tp") / (col("tp") + col("fn")))
          .otherwise(0.0), 6))
      .withColumn("f1",
        round(when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(0.0), 6))
  }

  /** Calibration curve: (bin, n, mean_prob, pos_rate, gap) over `bins`
    * equal-width probability bins (prob = 1.0 folds into the top bin). */
  def reliability(
      scored: DataFrame, labelCol: String, probCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val y = col(labelCol).cast("double")
    scored
      .groupBy(least(floor(col(probCol) * bins), lit(bins - 1L)).cast("int").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col(probCol)), 6).as("mean_prob"),
        round(avg(y), 6).as("pos_rate"))
      .withColumn("gap", round(abs(col("mean_prob") - col("pos_rate")), 6))
  }

  /** Expected calibration error from a [[reliability]] curve: the
    * row-count-weighted mean |gap|. Curve tables are bins-sized, so the
    * single-row collect is O(1). */
  def ece(curve: DataFrame): Double = {
    val r = curve.agg(
      sum(col("gap") * col("n")).as("g"), sum(col("n")).as("n")).collect().head
    if (r.isNullAt(1) || r.getLong(1) == 0L) Double.NaN
    else r.getDouble(0) / r.getLong(1)
  }
}
