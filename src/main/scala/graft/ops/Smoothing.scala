package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Truncated exponentially-weighted moving average over a keyed series —
  * the standard signal smoother for per-entity metric streams (no analog
  * in the reference; engine time-series surface beside [[Resample]]).
  *
  * The classic recursive EWMA (y_i = α·x_i + (1−α)·y_{i−1}) carries state
  * from the first observation forever, which forces either a sequential
  * scan per key or an exploding-weight prefix trick that overflows doubles.
  * The TRUNCATED form used here cuts the kernel at `k` taps:
  *
  *   y_i = Σ_{j=0..k−1} w_j · x_{i−j}  /  Σ_{j∈present} w_j,   w_j = α(1−α)^j
  *
  * renormalized over the taps that exist (so the first rows of a key are
  * an average of what's available, not biased toward zero). For any α the
  * dropped tail mass is (1−α)^k — at α=0.3, k=10 that is <3%, and the
  * truncation is what makes the operator scale: each output row depends on
  * a FIXED window of its key's history, so the whole computation is k
  * `lag` taps over ONE partitioned window exchange (all taps share the
  * window spec → a single sort, whole-stage codegen arithmetic, no
  * per-key sequential state, no driver involvement).
  *
  * Weights are materialized as decimal literals by the caller-facing
  * query layer when cross-engine bit-parity matters (the oracle embeds
  * the same literals; see `weights`).
  */
object Smoothing {

  /** The truncated kernel, exposed so oracle SQL can embed the SAME
    * double constants this op computes with. */
  def weights(alpha: Double, k: Int): Seq[Double] =
    (0 until k).map(j => alpha * math.pow(1.0 - alpha, j))

  /** Adds `ewma` next to `valueCol`. Null values are excluded from both
    * numerator and denominator (a null tap contributes nothing rather
    * than nulling the whole window).
    *
    * @param orderCols total order within a key (include a unique
    *                  tie-breaker for determinism)
    */
  def ewmaTruncated(
      df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
      valueCol: String, alpha: Double, k: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(k >= 1, "k must be >= 1")
    val w = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val ws = weights(alpha, k)
    val taps = (0 until k).map { j =>
      val x = if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w)
      (when(x.isNotNull, lit(ws(j)) * x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(ws(j))).otherwise(lit(0.0)))
    }
    val num = taps.map(_._1).reduce(_ + _)
    val den = taps.map(_._2).reduce(_ + _)
    df.withColumn("ewma", when(den > 0, num / den))
  }
}
