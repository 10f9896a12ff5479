package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-grid time-series resampling with forward fill — the alignment
  * step a sensor/metrics training pipeline runs before windowed feature
  * extraction (the reference's per-hour calendar aggregation,
  * `Transformation.scala`, is the step=1h special case of this with no
  * gap semantics).
  *
  * Semantics per key: observations bucket to `floor(ts / step)`; the
  * LATEST observation in a bucket wins ((ts, tieBreak) order); the
  * output grid spans the key's [min, max] bucket with one row per step;
  * empty buckets carry the last earlier observation (`is_filled` =
  * true) — a leading empty bucket cannot exist by construction since
  * the grid starts at the key's first observation.
  *
  * Scale shape: one shuffle keyed (key, bucket) for the in-bucket
  * argmax, one keyed (key) aggregate for the span, a `sequence`-explode
  * that emits span/step rows PER KEY (distributed — no driver-side
  * calendar), a co-keyed left join, and per-key ordered windows for the
  * fill. Nothing global; grid width is bounded by the key's own time
  * span, so a 100 TB corpus of short-lived keys stays narrow. */
object Resample {

  /** @param step grid width in seconds
    * @param tieBreak column ordering late-arriving same-timestamp rows
    *                 (latest (ts, tieBreak) wins the bucket) */
  def ffill(
      df: DataFrame, key: String, ts: String, value: String,
      step: Long, tieBreak: String): DataFrame = {
    val stepUs = step * 1000000L
    val bucketed = df
      .filter(col(value).isNotNull)
      .withColumn("bucket", floor(unix_micros(col(ts)) / stepUs))
    val latest = bucketed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(key), col("bucket"))
          .orderBy(col(ts).desc, col(tieBreak).desc)))
      .filter(col("rn") === 1)
      .select(col(key), col("bucket"), col(value).as("v_obs"))
    val grid = latest
      .groupBy(key)
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col(key), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val fillWin = Window.partitionBy(key)
      .orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(latest, Seq(key, "bucket"), "left")
      .select(
        col(key),
        timestamp_micros(col("bucket") * stepUs).as("bucket_ts"),
        last(col("v_obs"), ignoreNulls = true).over(fillWin).as(value),
        col("v_obs").isNull.as("is_filled"))
  }

  /** Linear interpolation variant: empty buckets take the straight line
    * between the key's previous and next observations instead of a step
    * function (`is_filled` marks interpolated rows; the final
    * observation's trailing gap — nothing to interpolate toward —
    * forward-fills). Same scale shape plus one backward window. */
  def interpolate(
      df: DataFrame, key: String, ts: String, value: String,
      step: Long, tieBreak: String): DataFrame = {
    val stepUs = step * 1000000L
    val bucketed = df
      .filter(col(value).isNotNull)
      .withColumn("bucket", floor(unix_micros(col(ts)) / stepUs))
    val latest = bucketed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(key), col("bucket"))
          .orderBy(col(ts).desc, col(tieBreak).desc)))
      .filter(col("rn") === 1)
      .select(col(key), col("bucket"), col(value).as("v_obs"))
    val grid = latest
      .groupBy(key)
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col(key), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val back = Window.partitionBy(key)
      .orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(key)
      .orderBy("bucket").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def bucketOf(c: Column): Column = when(c.isNotNull, col("bucket"))
    grid
      .join(latest, Seq(key, "bucket"), "left")
      .withColumn("v_prev", last(col("v_obs"), ignoreNulls = true).over(back))
      .withColumn("b_prev", last(bucketOf(col("v_obs")), ignoreNulls = true).over(back))
      .withColumn("v_next", first(col("v_obs"), ignoreNulls = true).over(fwd))
      .withColumn("b_next", first(bucketOf(col("v_obs")), ignoreNulls = true).over(fwd))
      .select(
        col(key),
        timestamp_micros(col("bucket") * stepUs).as("bucket_ts"),
        when(col("v_obs").isNotNull, col("v_obs"))
          .when(col("v_next").isNull, col("v_prev"))
          .otherwise(
            col("v_prev") + (col("v_next") - col("v_prev")) *
              (col("bucket") - col("b_prev")) / (col("b_next") - col("b_prev")))
          .as(value),
        col("v_obs").isNull.as("is_filled"))
  }
}
