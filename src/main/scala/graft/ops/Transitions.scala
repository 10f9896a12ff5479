package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key event sequences:
  * P(next = b | current = a) estimated from adjacent-event pairs in
  * each key's (time, tieBreak)-ordered stream — the behavioral-model
  * summary behind next-event prediction, anomaly scoring, and funnel
  * drop-off analysis.
  *
  * Scale shape: ONE per-key ordered window (LEAD) builds the adjacent
  * pairs — no self-join, no global ordering — then two keyed
  * aggregations (pair counts, from-state totals). The matrix itself is
  * |states|², driver-safe by construction. The probability divides two
  * exact longs cast to double, bit-deterministic across engines. */
object Transitions {

  /** @return (from_state, to_state, n, p) — transition counts and
    *         row-normalized probabilities. */
  def matrix(
      df: DataFrame, key: String, state: String,
      time: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(time), col(tieBreak))
    val pairs = df
      .withColumn("to_state", lead(col(state), 1).over(w))
      .filter(col("to_state").isNotNull)
      .select(col(state).as("from_state"), col("to_state"))
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    val totals = counts.groupBy("from_state")
      .agg(sum("n").as("row_total"))
    counts.join(totals, "from_state")
      .select(
        col("from_state"), col("to_state"), col("n"),
        (col("n").cast("double") / col("row_total").cast("double")).as("p"))
  }
}
