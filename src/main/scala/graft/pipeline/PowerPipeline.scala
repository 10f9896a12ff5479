package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Reference-parity preprocessing pipeline for the UCI household-power CSV
  * (re-expression of `/root/reference` `preprocessing/Cleaning.scala`,
  * `reduction.scala`, `Transformation.scala` — WHAT it computes, not HOW).
  *
  * Engine fixes over the reference (SURVEY.md §3.2, BASELINE.md):
  *  - before/after stats in ONE aggregation pass (reference runs six
  *    separate count() jobs, `Cleaning.scala:55-79`)
  *  - all column min/max for scaling in ONE pass (reference scans once per
  *    column, `Transformation.scala:53-57`)
  *  - gap detection windows partition by day (reference uses a global
  *    unpartitioned window → single task, `Cleaning.scala:68`), counting
  *    cross-midnight boundaries separately
  *  - casts use `try_cast` so Spark 4 ANSI mode keeps the reference's
  *    invalid→null semantics (`Cleaning.scala:97-101` relied on non-ANSI)
  */
object PowerPipeline {

  /** Measurement columns (ref `Cleaning.scala:11-19`). */
  val numCols: Seq[String] = Seq(
    "Global_active_power", "Global_reactive_power", "Voltage",
    "Global_intensity", "Sub_metering_1", "Sub_metering_2", "Sub_metering_3")

  val rawSchema: StructType =
    StructType(("Date" +: "Time" +: numCols).map(StructField(_, StringType)))

  /** S1 — raw `;`-separated headered CSV, explicit all-string schema
    * (no inference — ref `Cleaning.scala:22-28`). */
  def loadRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(rawSchema)
      .option("header", "true")
      .option("sep", ";")
      .csv(path)

  /** P3 — `?` placeholder → null in every column (ref `Cleaning.scala:31-33`). */
  def replaceMissing(df: DataFrame): DataFrame =
    df.na.replace(df.columns.toSeq, Map("?" -> null))

  /** F1/F2 — DateTime from Date+Time, `d/M/yyyy H:mm:ss`, invalid → null
    * (ref `Cleaning.scala:36-41`; `try_to_timestamp` for ANSI safety). */
  def addDateTime(df: DataFrame): DataFrame =
    df.withColumn(
      "DateTime",
      expr("try_to_timestamp(concat_ws(' ', Date, Time), 'd/M/yyyy H:mm:ss')"))

  /** Before-cleaning statistics (ref `Cleaning.scala:53-89`) — single
    * aggregation pass for the row-local counts + one windowed pass for
    * duplicates/gaps, instead of six jobs. */
  final case class BeforeStats(
      total: Long, badDateTime: Long, missingAny: Long, missingAll: Long,
      duplicateTimestamps: Long, gapRows: Long)

  def beforeStats(df: DataFrame): BeforeStats = {
    val anyNull = numCols.map(col(_).isNull).reduce(_ || _)
    val allNull = numCols.map(col(_).isNull).reduce(_ && _)
    val row = df
      .agg(
        count(lit(1)).as("total"),
        count(when(col("DateTime").isNull, 1)).as("bad_dt"),
        count(when(anyNull, 1)).as("miss_any"),
        count(when(allNull, 1)).as("miss_all"))
      .first()
    // duplicate timestamps: rows beyond the first per DateTime (A2 analog)
    val dups = df
      .filter(col("DateTime").isNotNull)
      .groupBy("DateTime")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("d"))
      .first()
      .getLong(0)
    // gap rows: consecutive-minute cadence broken (ref counts gap != 60s,
    // `Cleaning.scala:70-79`). Window partitioned BY DAY for scale; the
    // (day count - 1) cross-midnight boundaries where a previous row exists
    // in another partition are accounted exactly: a continuous recording
    // has a 60s gap at midnight, so boundaries are checked via day edges.
    val byDay = Window.partitionBy(to_date(col("DateTime"))).orderBy(col("DateTime"))
    val withPrev = df
      .filter(col("DateTime").isNotNull)
      .withColumn("prev", lag(col("DateTime"), 1).over(byDay))
    val gapsWithinDay = withPrev
      .filter(
        col("prev").isNotNull &&
          unix_timestamp(col("DateTime")) - unix_timestamp(col("prev")) =!= 60)
      .count()
    // cross-midnight: compare each day's first row to the previous day's
    // last row via a tiny per-day aggregate (2 rows per day, trivially small)
    val dayEdges = df
      .filter(col("DateTime").isNotNull)
      .groupBy(to_date(col("DateTime")).as("day"))
      .agg(min(col("DateTime")).as("first_ts"), max(col("DateTime")).as("last_ts"))
    val edgeW = graft.core.Windows.bounded(col("day"))
    val gapsAcrossDays = dayEdges
      .withColumn("prev_last", lag(col("last_ts"), 1).over(edgeW))
      .filter(
        col("prev_last").isNotNull &&
          unix_timestamp(col("first_ts")) - unix_timestamp(col("prev_last")) =!= 60)
      .count()
    BeforeStats(
      row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      dups, gapsWithinDay + gapsAcrossDays)
  }

  /** P6/P10 — drop rows with bad timestamps or any missing measurement
    * (ref `Cleaning.scala:92-94`). */
  def dropInvalid(df: DataFrame): DataFrame =
    df.filter(col("DateTime").isNotNull).na.drop("any", numCols)

  /** P7 — string → double casts, invalid → null (ref `Cleaning.scala:97-101`). */
  def castNumerics(df: DataFrame): DataFrame =
    numCols.foldLeft(df)((d, c) => d.withColumn(c, expr(s"try_cast($c AS DOUBLE)")))

  /** P11 — full-row dedup on DateTime + measurements (ref `Cleaning.scala:117-120`). */
  def dropDups(df: DataFrame): DataFrame =
    df.dropDuplicates("DateTime" +: numCols)

  /** P9/A10 — IQR outlier report for one column (ref `Cleaning.scala:127-144`). */
  final case class OutlierReport(col: String, q1: Double, q3: Double, lower: Double,
      upper: Double, outliers: Long)

  def iqrOutliers(df: DataFrame, column: String): OutlierReport = {
    val Array(q1, q3) = df.stat.approxQuantile(column, Array(0.25, 0.75), 0.001)
    val iqr = q3 - q1
    val (lo, hi) = (q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    val n = df.filter(col(column) < lo || col(column) > hi).count()
    OutlierReport(column, q1, q3, lo, hi, n)
  }

  /** A1 — minute → hour aggregation (ref `reduction.scala:10-24`). */
  def aggregateHourly(df: DataFrame): DataFrame = {
    val aggs = numCols.map(c => avg(col(c)).as(s"avg_$c"))
    df.withColumn("Hour", date_trunc("hour", col("DateTime")))
      .groupBy("Hour")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("Hour")
  }

  /** P12 — seeded Bernoulli hour sampling (ref `reduction.scala:27-29`). */
  def sampleHours(df: DataFrame, fraction: Double = 0.5): DataFrame =
    df.sample(withReplacement = false, fraction, 42L)

  /** P1 — feature selection: drop reactive power (ref `reduction.scala:32-43`). */
  val featureCols: Seq[String] = Seq(
    "Hour", "avg_Global_active_power", "avg_Voltage", "avg_Global_intensity",
    "avg_Sub_metering_1", "avg_Sub_metering_2", "avg_Sub_metering_3")

  def selectFeatures(df: DataFrame): DataFrame =
    df.select(featureCols.map(col): _*)

  /** P2/P13/M4/M9/M3 — derived calendar columns, one-hot encodings,
    * engineered feature, min-max scaling (ref `Transformation.scala:10-89`;
    * fixture column order contract in FIXTURES.md §3). Scaling stats for
    * all four columns come from ONE aggregation pass. */
  val scaledCols: Seq[String] = Seq(
    "avg_Global_active_power", "avg_Voltage", "avg_Global_intensity",
    "total_sub_metering")

  def transform(df: DataFrame): DataFrame = {
    val withCal = df
      .withColumn("date", to_date(col("Hour")))
      .withColumn("hour_of_day", hour(col("Hour")))
    val dow = dayofweek(col("date")) // 1=Sunday (ref `Transformation.scala:21-25`)
    val withDow = (1 to 7).foldLeft(withCal)((d, i) =>
      d.withColumn(s"dow_$i", when(dow === i, 1.0).otherwise(0.0)))
    val withMonth = (1 to 12).foldLeft(withDow)((d, i) =>
      d.withColumn(s"month_$i", when(month(col("date")) === i, 1.0).otherwise(0.0)))
    val withTotal = withMonth.withColumn(
      "total_sub_metering",
      col("avg_Sub_metering_1") + col("avg_Sub_metering_2") + col("avg_Sub_metering_3"))
    // single-pass min/max for ALL scaled columns, broadcast back
    val statAggs = scaledCols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val stats = withTotal.agg(statAggs.head, statAggs.tail: _*)
    val scaled = scaledCols.foldLeft(withTotal.crossJoin(broadcast(stats)))((d, c) =>
      d.withColumn(
        s"${c}_scaled",
        when(col(s"__mx_$c") === col(s"__mn_$c"), 0.0)
          .otherwise((col(c) - col(s"__mn_$c")) / (col(s"__mx_$c") - col(s"__mn_$c")))))
    scaled.drop(scaledCols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Full parity pipeline: raw CSV path → transformed hourly features. */
  def run(spark: SparkSession, rawPath: String, sampleFraction: Option[Double] = None): DataFrame = {
    val cleaned = dropDups(
      dropInvalid(castNumerics(addDateTime(replaceMissing(loadRaw(spark, rawPath))))))
    val hourly = aggregateHourly(cleaned)
    val sampled = sampleFraction.map(f => sampleHours(hourly, f)).getOrElse(hourly)
    transform(selectFeatures(sampled)).orderBy("Hour") // ordered sink, ref reduction.scala:23
  }
}
