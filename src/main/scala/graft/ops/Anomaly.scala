package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volume-anomaly detection over an event stream — the monitoring query
  * every ingestion pipeline runs: per (event type, hour) counts scored as
  * z-scores against that type's own hourly distribution.
  *
  * Two keyed aggregations, no windows at all: the hourly roll-up shuffles
  * once on (type, hour); the per-type mean/stddev summary is #types rows
  * and broadcast back. Nothing grows with data volume except the hourly
  * table itself (hours × types — calendar-bounded). The same roll-up is
  * streaming-ready: feed it a watermarked stream and the groupBy becomes
  * an incremental stateful aggregation (see [[graft.streaming
  * .EventStreams]] for the tumbling-window twin). */
object Anomaly {

  /** Hourly counts with per-type z-scores; rows with |z| below `minAbsZ`
    * (after 4-decimal rounding, so the cut is reproducible cross-engine)
    * are dropped. Types with fewer than 2 distinct hours have no sample
    * stddev and are dropped with them. */
  def hourlyZScores(events: DataFrame, minAbsZ: Double): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hourly
      .groupBy("event_type")
      .agg(avg(col("cnt")).as("mu"), stddev_samp(col("cnt")).as("sigma"))
      .filter(col("sigma").isNotNull && col("sigma") > 0)
    hourly
      .join(broadcast(stats), Seq("event_type"))
      .withColumn("z", round((col("cnt") - col("mu")) / col("sigma"), 4))
      .filter(abs(col("z")) >= minAbsZ)
  }
}
