package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation (Kaplan & Meier 1958) — the
  * right-censored time-to-event curve behind "how long until a user
  * converts / churns / a part ships", where naive averages are BIASED by
  * the subjects that have not converted YET (dropping them
  * underestimates, censoring at horizon overestimates; KM handles both).
  *
  * Scale shape: subjects arrive as one row each (duration, event-flag) —
  * whatever keyed aggregation produced them owns the data-sized work.
  * This estimator aggregates them onto the DURATION GRID (bounded by the
  * observation calendar, never by subject count) and runs the risk-set
  * arithmetic and the cumulative product (as exp∘Σ∘ln) over that grid
  * with [[graft.core.Windows.bounded]] — a single-task window over a
  * few-hundred-row input, by design. */
object Survival {

  /** KM curve over per-subject rows: `tCol` integral duration,
    * `eventCol` 1 = event observed, 0 = right-censored. Returns one row
    * per EVENT time: (t, n_risk, events, survival). */
  def kaplanMeier(subjects: DataFrame, tCol: String, eventCol: String): DataFrame = {
    val grid = subjects.groupBy(col(tCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("events"),
        count(lit(1)).as("leaving"))
    val total = subjects.agg(count(lit(1)).as("n_tot"))
    val before = graft.core.Windows.bounded(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = graft.core.Windows.bounded(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // a step where EVERY at-risk subject converts has factor 0: survival
    // is exactly 0 from there on, and ln(0) must never reach the product
    // (Spark's null-log would silently DROP the term; DuckDB errors)
    val factor = lit(1.0) - col("events").cast("double") / col("n_risk")
    grid.crossJoin(broadcast(total))
      .withColumn("n_risk", col("n_tot") - coalesce(sum(col("leaving")).over(before), lit(0L)))
      .filter(col("events") > 0)
      .withColumn("survival",
        when(max(when(factor <= 0.0, 1).otherwise(0)).over(upTo) === 1, lit(0.0))
          .otherwise(exp(sum(when(factor > 0.0, log(factor))).over(upTo))))
      .select(col("t"), col("n_risk"), col("events"), col("survival"))
  }
}
