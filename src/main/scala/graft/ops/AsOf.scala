package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (nearest-earlier match), SURVEY.md §2.3.
  *
  * Spark has no built-in as-of join; the scalable composition (preference
  * (a) of the custom-operator policy) is the union + ordered-window trick:
  * tag probe/build rows, union them, and carry the latest build row forward
  * with `last(..., ignoreNulls=true)` over a window partitioned by key and
  * ordered by time. One shuffle on the key, no cross product, no
  * per-probe subquery — this holds at 100 TB because state per key is a
  * single carried row, and the window is partitioned (never global).
  */
object AsOf {

  /** For each probe row, attach `asof_<valueCol>` columns from the latest
    * build row with the same `key` and `buildTime <= probeTime`.
    * Build rows at exactly the probe timestamp DO match (<=).
    *
    * @param probe     left side; all its columns are preserved
    * @param build     right side; only `key`, `time`, `valueCols` are read
    * @param key       equi-key column name present on both sides
    * @param time      event-time column name present on both sides
    * @param tieBreak  probe column giving a total order among equal probe
    *                  timestamps (keeps the window deterministic)
    * @param valueCols build columns to carry onto matched probe rows
    */
  def join(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      tieBreak: String,
      valueCols: Seq[String]): DataFrame = {
    val pCols = probe.columns
    // Align schemas: probe keeps its columns, build contributes b_<v> copies.
    val taggedProbe = valueCols
      .foldLeft(probe.withColumn("__is_probe", lit(1))) { (df, v) =>
        df.withColumn(s"__b_$v", lit(null).cast(build.schema(v).dataType))
      }
      .withColumn("__b_time", lit(null).cast(build.schema(time).dataType))
    val buildProjected = build.select(
      (Seq(col(key), col(time)) ++ valueCols.map(v => col(v).as(s"__b_$v"))): _*)
    val taggedBuild = pCols
      .foldLeft(buildProjected.withColumn("__is_probe", lit(0))) { (df, c) =>
        if (c == key || c == time) df
        else df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
      }
      .withColumn("__b_time", col(time))
      .select(taggedProbe.columns.map(col): _*)

    // Build rows sort before probe rows at the same timestamp (`__is_probe`
    // asc) so a same-instant build row is visible to the probe.
    val w = Window
      .partitionBy(key)
      .orderBy(col(time), col("__is_probe"), col(tieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = valueCols.foldLeft(taggedProbe.unionByName(taggedBuild)) { (df, v) =>
      df.withColumn(s"asof_$v", last(col(s"__b_$v"), ignoreNulls = true).over(w))
    }.withColumn(s"asof_$time", last(col("__b_time"), ignoreNulls = true).over(w))

    carried
      .filter(col("__is_probe") === 1)
      .select((pCols.map(col) ++ valueCols.map(v => col(s"asof_$v")) :+ col(s"asof_$time")): _*)
  }
}
