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

  /** Stratified KM: one curve per `gCol` group. Unlike the pooled
    * estimator this needs NO bounded-window caveat at all — every
    * window is PARTITIONED by the group, so the construction
    * distributes over however many strata exist (each stratum's grid
    * stays calendar-bounded). Returns (g, t, n_risk, events,
    * survival), event rows only. */
  def kaplanMeierBy(
      subjects: DataFrame, gCol: String, tCol: String, eventCol: String): DataFrame = {
    val grid = subjects.groupBy(col(gCol).as("g"), col(tCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("events"),
        count(lit(1)).as("leaving"))
    val total = subjects.groupBy(col(gCol).as("g")).agg(count(lit(1)).as("n_tot"))
    val before = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val factor = lit(1.0) - col("events").cast("double") / col("n_risk")
    grid.join(total, "g")
      .withColumn("n_risk", col("n_tot") - coalesce(sum(col("leaving")).over(before), lit(0L)))
      .filter(col("events") > 0)
      .withColumn("survival",
        when(max(when(factor <= 0.0, 1).otherwise(0)).over(upTo) === 1, lit(0.0))
          .otherwise(exp(sum(when(factor > 0.0, log(factor))).over(upTo))))
      .select(col("g"), col("t"), col("n_risk"), col("events"), col("survival"))
  }

  /** Two-sample log-rank test (Mantel-Haenszel): at every POOLED event
    * time, the focal group's observed vs hypergeometric-expected event
    * counts; chi² = (ΣO − ΣE)² / ΣV. All risk sets are exact integers
    * built on the pooled calendar-bounded time grid (zero-filled per
    * group, partitioned windows); only the E/V terms are FP. Returns
    * ONE row: (n_times, obs_a, exp_a, var_sum, chi2) for `focal` = the
    * group the O/E is reported for. */
  def logRank(
      subjects: DataFrame, gCol: String, tCol: String, eventCol: String,
      focal: String): DataFrame = {
    val leavings = subjects.groupBy(col(gCol).as("g"), col(tCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("d"),
        count(lit(1)).as("leaving"))
    val totals = subjects.groupBy(col(gCol).as("g")).agg(count(lit(1)).as("n_tot"))
    // pooled event-time grid × groups; each group's at-risk at a pooled
    // time must subtract ALL its prior leavings — including censor-only
    // times absent from the event grid — so the risk sets come from a
    // band join of two calendar-bounded grids, not a window over the
    // (incomplete) event grid
    val times = leavings.groupBy("t").agg(sum(col("d")).as("d_all"))
      .filter(col("d_all") > 0).select("t")
    val lv = leavings.select(
      col("g").as("g2"), col("t").as("lt"), col("leaving"), col("d").as("d0"))
    val atRisk = times.crossJoin(totals)
      .join(lv, col("g") === col("g2") && col("lt") <= col("t"), "left")
      .groupBy("t", "g", "n_tot")
      .agg(
        coalesce(sum(when(col("lt") < col("t"), col("leaving"))), lit(0L)).as("gone"),
        coalesce(sum(when(col("lt") === col("t"), col("d0"))), lit(0L)).as("d"))
      .withColumn("n_risk", col("n_tot") - col("gone"))
    val byTime = atRisk.groupBy("t").agg(
      sum(col("d")).as("d_t"), sum(col("n_risk")).as("n_t"),
      sum(when(col("g") === focal, col("d")).otherwise(lit(0L))).as("d_a"),
      sum(when(col("g") === focal, col("n_risk")).otherwise(lit(0L))).as("n_a"))
    val pa = col("n_a").cast("double") / col("n_t")
    byTime
      .filter(col("n_t") > 1) // variance term needs n_t - 1 > 0
      .agg(
        count(lit(1)).as("n_times"),
        sum(col("d_a")).as("obs_a"),
        sum(col("d_t") * pa).as("exp_a"),
        sum(col("d_t") * pa * (lit(1.0) - pa) *
          (col("n_t") - col("d_t")).cast("double") / (col("n_t") - 1)).as("var_sum"))
      .select(
        col("n_times"), col("obs_a"), col("exp_a"), col("var_sum"),
        (((col("obs_a") - col("exp_a")) * (col("obs_a") - col("exp_a"))) /
          col("var_sum")).as("chi2"))
  }

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
