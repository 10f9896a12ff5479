package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, ApproximatePercentile, Count, HyperLogLogPlusPlus, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Approximate-query mode (SURVEY.md §4 extension point (c): a
  * `Rule[LogicalPlan]` registered through `SparkSessionExtensions`).
  *
  * When `spark.graft.approx.enabled=true`, exact aggregates whose memory
  * cost grows with the data are swapped for their bounded-state sketch
  * equivalents, so the SAME query text can run exploratively over 100 TB:
  *
  *   - `COUNT(DISTINCT x)`  -> HyperLogLog++ (`approx_count_distinct`):
  *     exact distinct expands every group into a distinct-shuffle; the
  *     sketch is a fixed few-KB buffer merged map-side.
  *   - `percentile(x, p)` / `median(x)` -> t-digest-style
  *     `approx_percentile`: exact percentile buffers EVERY group value on
  *     the reducer; the sketch is bounded by the accuracy parameter.
  *     (`median` is runtime-replaced with `percentile(x, 0.5)` before the
  *     optimizer runs, so one pattern covers both.)
  *
  * Default OFF — the oracle-checked registry always runs exact. The swap
  * preserves result *types* (approx_percentile returns the input type, so
  * it is cast back to percentile's double), not exact values; callers opt
  * in per session/query, trading bounded error for bounded state.
  */
object ApproxSwapRule extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.approx.enabled"

  private def enabled: Boolean =
    conf.getConfString(ConfKey, "false").toBoolean

  /** Literal frequency 1 is percentile's default; any other frequency has
    * no approx_percentile equivalent, so the swap is skipped. */
  private def unitFrequency(e: Expression): Boolean = e match {
    case Literal(f: Long, _) => f == 1L
    case Literal(f: Int, _) => f == 1
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressionsUp {
          // COUNT(DISTINCT x) — single-argument only: the multi-column
          // form has no direct HLL++ equivalent (it would need a struct
          // wrap, changing null semantics), so it stays exact.
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child),
              isDistinct = false)
          case ae @ AggregateExpression(p: Percentile, _, false, _, _)
              if unitFrequency(p.frequencyExpression) =>
            // approx_percentile yields the child's type (it selects real
            // values, no interpolation); cast restores percentile's
            // declared double/array<double> so downstream references and
            // the Aggregate's output schema are unchanged.
            Cast(
              ae.copy(aggregateFunction = new ApproximatePercentile(
                p.child,
                p.percentageExpression,
                Literal(ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY))),
              p.dataType)
        }
    }
}
