package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 history construction — turn a change
  * log (key, event time, attributes) into versioned dimension rows with
  * validity intervals, the standard warehouse shape for "what did this
  * dimension look like at time t".
  *
  * Shape: everything is per-key window work — `Window.partitionBy(key)`,
  * never global — so the build is one shuffle on the key and scales with
  * the widest single key's history, not the table:
  *
  *   1. collapse no-op changes: a row opens a new version only when some
  *      tracked attribute differs from the previous row of the SAME key
  *      (lag compare; the first row of a key always opens);
  *   2. close intervals: `valid_to` = next version's `valid_from`
  *      (lead), open-ended (null) for the current version.
  *
  * Point-in-time lookup is then a plain range predicate
  * (`valid_from <= t AND (valid_to IS NULL OR t < valid_to)`) — and the
  * engine's as-of join ([[AsOf]]) answers the same question against the
  * raw log when no materialized dimension exists. */
object Scd2 {

  /** @param orderCols total order of changes within a key (event time +
    *                  unique tie-break — determinism policy)
    * @param attrCols  tracked attributes; a version opens when ANY differs */
  def buildHistory(
      changes: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && attrCols.nonEmpty,
      "keys, order, and attributes must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val attrs = struct(attrCols.map(col): _*)
    val changed = changes
      .withColumn("_prev", lag(attrs, 1).over(w))
      // null-safe: the first row per key has _prev = null and must open
      .filter(col("_prev").isNull || !(col("_prev") <=> attrs))
      .drop("_prev")
    val vw = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    changed
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(vw))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
