package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-ID assignment — split each key's event stream into sessions at
  * inactivity gaps and tag every EVENT with its session index. The
  * companion to the session-WINDOW aggregate (q43 / EventStreams
  * .sessionAgg): the aggregate collapses a session to one row, this keeps
  * the events and labels them, which is what downstream per-event work
  * (attribution, sequence modeling, funnel-within-session) needs.
  *
  * Classic two-window construction, both windows partitioned by the key
  * (never global, one shuffle, one sort shared by both):
  *   1. `lag` the event time — a gap > threshold (or the first event of a
  *      key) opens a new session;
  *   2. running `sum` of the open-flags numbers the sessions 1..n within
  *      the key.
  */
object Sessionize {

  /** Adds `session_id` (1-based within each key).
    *
    * @param tieCol unique tie-break within (key, ts) for determinism
    * @param gapUs  inactivity threshold in microseconds; a gap strictly
    *               greater than this opens a new session
    */
  def assignSessions(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapUs: Long): DataFrame = {
    require(gapUs > 0, "gap must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    df
      .withColumn("_prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn(
        "_open",
        when(
          col("_prev_us").isNull ||
            unix_micros(col(tsCol)) - col("_prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_open")).over(w))
      .drop("_prev_us", "_open")
  }
}
