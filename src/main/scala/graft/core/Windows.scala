package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Window specs for provably-bounded inputs — aggregate outputs whose row
  * count is fixed by calendar, cluster, or vocabulary size (years, days,
  * shuffle buckets, top-N vocab rows), not by data size.
  *
  * A single-task window is fine at any SF precisely because the input is
  * bounded by design; declaring it through this helper (rather than a bare
  * `Window.orderBy`) records that judgement at the call site. A constant
  * `partitionBy(lit(0))` would NOT make the intent machine-visible: Spark
  * 4's `EliminateWindowPartitions` rule strips foldable partition keys, so
  * the plan is identical either way. Enforcement lives in PlanShapeSpec,
  * which fails CI for any registry query running an effectively
  * unpartitioned window over unaggregated input, and the per-execution
  * WindowExec log warning is quieted in [[GraftSession]] in favour of that
  * gate.
  */
object Windows {

  /** Single-task window over a bounded input, ordered by `order`. */
  def bounded(order: Column*): WindowSpec = Window.orderBy(order: _*)
}
