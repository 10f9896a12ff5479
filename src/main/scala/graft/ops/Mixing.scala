package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture epoch weighting — the curation step that up-samples
  * high-quality sources and down-samples bulk crawl before training
  * (every published pretraining mix does a version of this).
  */
object Mixing {

  /** Repeat each row `weight` times, tagging the copy index as `epoch`
    * (1-based). A weight of 0 (or negative) drops the row — so one column
    * expresses both up-sampling and filtering. Narrow op: no shuffle; the
    * blow-up is bounded by the max weight, and rows stay on their input
    * partitions (downstream shuffles see the mixed distribution, which is
    * the point). Fractional weights: integer part here, route the
    * remainder through a seeded Bernoulli `sample` — documented, not
    * automatic, so the oracle-checked path stays exact. */
  def byWeight(df: DataFrame, weight: Column, epochName: String = "epoch"): DataFrame = {
    val w = weight.cast("int")
    // NOT sequence(1, w) bare: Spark's sequence REVERSES when stop < start
    // (sequence(1, 0) = [1, 0]), so weight 0 must map to an explicit empty
    // array, which (non-outer) explode then drops.
    df.withColumn(epochName,
      explode(when(w >= 1, sequence(lit(1), w)).otherwise(array().cast("array<int>"))))
  }
}
