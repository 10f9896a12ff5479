package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — "how many users did A, then B after A, then C
  * after B …" — the standard product-analytics question over an event log
  * (no analog in the reference's batch scripts; a first-class engine op).
  *
  * Semantics (min-chain): stage 1's reach time is the user's earliest
  * stage-1 event; stage k's reach time is the earliest stage-k event
  * STRICTLY after the stage-(k−1) reach time. Strict `>` makes the chain
  * well-defined under timestamp ties (an event simultaneous with the
  * previous stage's reach never counts as progress), so the result is
  * independent of any tie-break ordering.
  *
  * Scale shape: ONE shuffle — `groupBy(user)` collects each user's
  * (ts, type) pairs and a codegen'd `aggregate` lambda folds the sorted
  * array left-to-right, advancing a (reached, last-time) accumulator.
  * A single linear pass per user replaces the k self-joins the naive
  * SQL formulation needs (the DuckDB oracle IS that k-join chain, so the
  * fold is cross-checked against the independent formulation). Per-user
  * state is that user's events for the funnel's types only — the same
  * bound any sessionization carries; nothing is data-sized on the driver.
  *
  * The one-pass fold equals the min-chain because events are folded in
  * ascending time order: every event strictly later than the stage-(k−1)
  * reach time is scanned after it, so the first qualifying stage-k event
  * the fold sees is the minimum-time one.
  */
object Funnel {

  /** Per-user funnel progress: `(user, reached, first_us, last_us)` where
    * `reached` ∈ [0, stages.length] is how many stages were completed in
    * order, `first_us`/`last_us` the stage-1 / stage-`reached` reach times
    * (microseconds; null when reached = 0).
    *
    * @param stages ordered funnel stage values of `typeCol` (distinct)
    */
  def userProgress(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "stages must be non-empty and distinct")
    val n = stages.length
    val stageArr = array(stages.map(lit): _*)
    val packed = events
      .filter(col(typeCol).isin(stages: _*))
      .select(
        col(userCol).as("user"),
        struct(unix_micros(col(tsCol)).as("us"), col(typeCol).as("t")).as("ev"))
      .groupBy("user")
      .agg(array_sort(collect_list(col("ev"))).as("evs"))
    // Fold accumulator: (reached, first_us, last_us). `least` keeps the
    // element_at index in range once reached = n (ANSI mode errors on
    // out-of-bounds; the `reached < n` conjunct alone doesn't guarantee
    // the index expression is never evaluated).
    val init = struct(
      lit(0).as("reached"), lit(Long.MinValue).as("first"), lit(Long.MinValue).as("last"))
    val folded = packed.withColumn(
      "acc",
      aggregate(
        col("evs"),
        init,
        (acc, x) => {
          val want = element_at(stageArr, least(acc("reached") + lit(1), lit(n)))
          val advance =
            acc("reached") < lit(n) && x("t") === want && x("us") > acc("last")
          when(
            advance,
            struct(
              (acc("reached") + lit(1)).as("reached"),
              when(acc("reached") === lit(0), x("us")).otherwise(acc("first")).as("first"),
              x("us").as("last")))
            .otherwise(acc)
        }))
    folded.select(
      col("user"),
      col("acc.reached").as("reached"),
      when(col("acc.reached") > 0, col("acc.first")).as("first_us"),
      when(col("acc.reached") > 0, col("acc.last")).as("last_us"))
  }

  /** Cumulative per-stage user counts: `(stage_idx, stage, n_users)` with
    * one row per declared stage (zero-user stages included). The histogram
    * over `reached` is at most `stages.length + 1` rows, so the cumulative
    * sum join is broadcast-trivial. */
  def stageCounts(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    val n = stages.length
    val stageArr = array(stages.map(lit): _*)
    val hist = userProgress(events, userCol, typeCol, tsCol, stages)
      .groupBy("reached").agg(count(lit(1)).as("cnt"))
    val idx = spark.range(1, n + 1).select(col("id").cast("int").as("stage_idx"))
    idx
      .join(hist, hist("reached") >= idx("stage_idx"), "left")
      .groupBy("stage_idx")
      .agg(coalesce(sum("cnt"), lit(0L)).cast("long").as("n_users"))
      .select(
        col("stage_idx"),
        element_at(stageArr, col("stage_idx")).as("stage"),
        col("n_users"))
  }
}
