package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt-Winters triple exponential smoothing (Holt 1957, Winters 1960)
  * over per-group daily series — level + trend + a `period`-slot
  * seasonal state folded once through the series, in BOTH classic
  * forms:
  *
  *  - ADDITIVE: x_t ≈ l + b + s_t — seasonality is a fixed offset
  *    (weekend dips of a constant size);
  *  - MULTIPLICATIVE: x_t ≈ (l + b)·s_t — seasonality scales with the
  *    level (weekend dips of a constant PERCENTAGE), the right form
  *    when amplitude grows with volume. Requires positive data.
  *
  * On a zero-trend constant-season series the two coincide exactly
  * (s ≡ x−m vs s ≡ x/m both reproduce the series) — spec-asserted.
  *
  * Scale shape: one keyed aggregation builds each group's ordered
  * series (bounded by the observation calendar, the same bound every
  * grid op in this engine relies on), then the smoothing is ONE
  * row-local higher-order `aggregate` fold over that array — no window
  * over fact-sized input, no driver loop, distributes over any number
  * of groups. Initialization: l₀ = mean of the first period, b₀ =
  * (second-period sum − first-period sum)/period², s₀ from the first
  * period against l₀.
  *
  * Returns (`gCol`, n_days, level, trend, forecast_next) — state after
  * the full fold plus the one-step-ahead forecast. Groups shorter than
  * 2·period+1 points are dropped (not enough data to initialize). */
object HoltWinters {

  def fit(
      daily: DataFrame, gCol: String, dayCol: String, cntCol: String,
      multiplicative: Boolean,
      alpha: Double = 0.3, beta: Double = 0.1, gamma: Double = 0.2,
      period: Int = 7): DataFrame = {
    require(period >= 2, "period must be at least 2")
    val p = period
    // the de-seasonalized observation: subtract (additive) or divide
    // out (multiplicative) the oldest seasonal slot
    val ds = if (multiplicative) "/" else "-"
    val s0Expr =
      if (multiplicative) s"transform(slice(xs, 1, $p), v -> v / l0)"
      else s"transform(slice(xs, 1, $p), v -> v - l0)"
    // new level given acc and x (referenced twice below, inlined both
    // times: Spark HOF lambdas have no let-binding)
    val lNew = s"$alpha * (x $ds element_at(acc.s, 1)) + ${1 - alpha} * (acc.l + acc.b)"
    val fold =
      s"""aggregate(
         |  slice(xs, ${p + 1}, size(xs) - $p),
         |  named_struct('l', l0, 'b', b0, 's', s0),
         |  (acc, x) -> named_struct(
         |    'l', $lNew,
         |    'b', $beta * (($lNew) - acc.l) + ${1 - beta} * acc.b,
         |    's', concat(slice(acc.s, 2, ${p - 1}),
         |      array($gamma * (x $ds ($lNew)) + ${1 - gamma} * element_at(acc.s, 1)))))"""
        .stripMargin
    val forecast =
      if (multiplicative) (col("st.l") + col("st.b")) * element_at(col("st.s"), 1)
      else col("st.l") + col("st.b") + element_at(col("st.s"), 1)
    daily.groupBy(col(gCol))
      .agg(expr(
        s"transform(sort_array(collect_list(struct($dayCol, $cntCol))), " +
          s"e -> CAST(e.$cntCol AS DOUBLE))").as("xs"))
      .filter(size(col("xs")) >= 2 * p + 1)
      .withColumn("l0",
        expr(s"aggregate(slice(xs, 1, $p), 0.0D, (a, v) -> a + v) / $p.0"))
      .withColumn("b0", expr(
        s"(aggregate(slice(xs, ${p + 1}, $p), 0.0D, (a, v) -> a + v) " +
          s"- aggregate(slice(xs, 1, $p), 0.0D, (a, v) -> a + v)) / ${p * p}.0"))
      .withColumn("s0", expr(s0Expr))
      .withColumn("st", expr(fold))
      .select(
        col(gCol), size(col("xs")).cast("long").as("n_days"),
        col("st.l").as("level"), col("st.b").as("trend"),
        forecast.as("forecast_next"))
  }
}
