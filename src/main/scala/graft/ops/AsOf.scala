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
  *
  * The carried build columns travel together in ONE struct, so the matched
  * values always come from the same build row even when some build value
  * columns are null (a per-column `last(ignoreNulls)` would stitch values
  * from different rows).
  */
object AsOf {

  /** For each probe row, attach `asof_<valueCol>` columns (and
    * `asof_<time>`) from the latest build row with the same `key` and
    * `buildTime <= probeTime`. Build rows at exactly the probe timestamp
    * DO match (<=). Among build rows tied on (key, time), the one with the
    * highest `tieBreak` wins (deterministic); `tieBreak` must exist on
    * both sides for that guarantee — if the build side lacks it, ties are
    * broken arbitrarily.
    *
    * @param probe     left side; all its columns are preserved
    * @param build     right side; only `key`, `time`, `tieBreak` (if
    *                  present), `valueCols` are read
    * @param key       equi-key column name present on both sides
    * @param time      event-time column name present on both sides
    * @param tieBreak  column giving a total order among equal timestamps
    * @param valueCols build columns to carry onto matched probe rows
    */
  def join(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      tieBreak: String,
      valueCols: Seq[String]): DataFrame =
    joinImpl(probe, build, key, time, tieBreak, valueCols, forward = false)

  /** Forward as-of: for each probe row, the EARLIEST build row with the
    * same `key` and `buildTime >= probeTime` (nearest-later match — "next
    * purchase after this click", "first reading after the restart").
    * Same-instant build rows DO match (>=). Among build rows tied on
    * (key, time), the LOWEST `tieBreak` wins — the mirror of the backward
    * join's highest-wins rule, so both directions pick the build row
    * "closest" to the probe under the (time, tieBreak) total order.
    * Identical scale shape: one keyed shuffle, one carried row of state,
    * just scanned in descending time order. */
  def joinForward(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      tieBreak: String,
      valueCols: Seq[String]): DataFrame =
    joinImpl(probe, build, key, time, tieBreak, valueCols, forward = true)

  /** [[join]]/[[joinForward]] with a STALENESS BOUND (pandas
    * `merge_asof(tolerance=...)`): matches farther than `tolerance` from
    * the probe are nulled out — "the latest quote, but only if it is at
    * most 5 minutes old". The bound applies as a post-filter on the
    * carried match, so the scale shape (one keyed shuffle, one carried
    * row of state) is unchanged; a bound can only REMOVE matches, never
    * change which row would have matched. */
  def joinWithin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      tieBreak: String,
      valueCols: Seq[String],
      tolerance: String,
      forward: Boolean = false): DataFrame = {
    val joined = joinImpl(probe, build, key, time, tieBreak, valueCols, forward)
    val matched = col(s"asof_$time")
    val within =
      if (forward) matched <= col(time) + expr(s"INTERVAL $tolerance")
      else matched >= col(time) - expr(s"INTERVAL $tolerance")
    val nulled = valueCols.foldLeft(joined) { (df, v) =>
      df.withColumn(s"asof_${v}__w", when(within, col(s"asof_$v")))
    }
    valueCols.foldLeft(
        nulled.withColumn(s"asof_$time", when(within, matched))) { (df, v) =>
        df.withColumn(s"asof_$v", col(s"asof_${v}__w")).drop(s"asof_${v}__w")
      }
  }

  private def joinImpl(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      time: String,
      tieBreak: String,
      valueCols: Seq[String],
      forward: Boolean): DataFrame = {
    val pCols = probe.columns
    val buildHasTieBreak = build.columns.contains(tieBreak)

    // The whole build row travels as one struct; probes carry a null struct.
    val buildStruct = struct(
      (col(time).as("__t") +: valueCols.map(v => col(v).as(v))): _*)
    val buildProjected = build.select(
      (Seq(col(key), col(time)) ++
        (if (buildHasTieBreak) Seq(col(tieBreak)) else Nil) :+
        buildStruct.as("__b")): _*)

    val taggedProbe = probe
      .withColumn("__is_probe", lit(1))
      .withColumn("__b", lit(null).cast(buildProjected.schema("__b").dataType))
    val taggedBuild = pCols
      .foldLeft(buildProjected.withColumn("__is_probe", lit(0))) { (df, c) =>
        if (c == key || c == time || (c == tieBreak && buildHasTieBreak)) df
        else df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
      }
      .select(taggedProbe.columns.toIndexedSeq.map(col): _*)

    // Build rows sort before probe rows at the same timestamp (`__is_probe`
    // asc) so a same-instant build row is visible to the probe; equal-time
    // build rows order by tieBreak so the LAST one scanned (highest
    // backward, lowest forward) is the one `last(...)` carries. Forward
    // mode scans time DESCENDING, so "carried so far" = nearest later.
    val w = Window
      .partitionBy(key)
      .orderBy(
        (if (forward) col(time).desc else col(time).asc),
        col("__is_probe"),
        (if (forward) col(tieBreak).desc_nulls_first else col(tieBreak).asc_nulls_first))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedProbe
      .unionByName(taggedBuild)
      .withColumn("__carried", last(col("__b"), ignoreNulls = true).over(w))

    carried
      .filter(col("__is_probe") === 1)
      .select(
        (pCols.toIndexedSeq.map(col) ++
          valueCols.map(v => col("__carried").getField(v).as(s"asof_$v")) :+
          col("__carried").getField("__t").as(s"asof_$time")): _*)
  }
}
