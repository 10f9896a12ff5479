package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality gate that rides the `Observation` API: every declared
  * expectation becomes an aggregate folded into the SAME action that
  * materializes the pipeline — the metrics are computed as the rows
  * stream past, so gating costs ZERO extra jobs. The naive alternative
  * (validate-then-write) scans the input twice; at 100 TB the second
  * scan is the whole bill again. Violations are checked AFTER the action
  * from the observed values, so a gate failure still leaves the output
  * written — callers decide whether to quarantine or abort downstream
  * (at scale, quarantining a written-but-flagged batch beats re-running
  * it).
  */
object QualityGate {

  /** One expectation: `agg` must satisfy `ok` after the action. */
  sealed trait Rule {
    def name: String
    def agg: Column
    def bound: Double
    def ok(v: Double): Boolean
  }

  /** At least `n` rows reached the sink. */
  final case class MinRows(n: Long) extends Rule {
    val name = s"min_rows_$n"
    def agg: Column = count(lit(1)).cast("double")
    def bound: Double = n.toDouble
    def ok(v: Double): Boolean = v >= n
  }

  /** Null fraction of `column` stays ≤ `maxFraction`. */
  final case class MaxNullFraction(column: String, maxFraction: Double) extends Rule {
    val name = s"null_frac_$column"
    def agg: Column =
      coalesce(avg(when(col(column).isNull, 1.0).otherwise(0.0)), lit(0.0))
    def bound: Double = maxFraction
    def ok(v: Double): Boolean = v <= maxFraction
  }

  /** Fraction of rows matching `predicate` stays ≤ `maxFraction` (domain
    * violations, out-of-range values, future timestamps...). */
  final case class MaxFractionWhere(label: String, predicate: Column, maxFraction: Double)
      extends Rule {
    val name = s"frac_$label"
    def agg: Column = coalesce(avg(when(predicate, 1.0).otherwise(0.0)), lit(0.0))
    def bound: Double = maxFraction
    def ok(v: Double): Boolean = v <= maxFraction
  }

  final case class Violation(rule: String, value: Double, bound: Double)

  /** Attach the rules to `df`. Returns the instrumented frame and a
    * report thunk — call it after ONE action has materialized the frame
    * (it reads the observed metrics of that action). */
  def attach(df: DataFrame, rules: Seq[Rule]): (DataFrame, () => Seq[Violation]) = {
    require(rules.nonEmpty, "QualityGate.attach: no rules")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val obs = Observation()
    val aggs = rules.map(r => r.agg.as(r.name))
    val out = df.observe(obs, aggs.head, aggs.tail: _*)
    val report = () => {
      val metrics = obs.get
      rules.flatMap { r =>
        val v = metrics(r.name) match {
          case null      => 0.0
          case n: Number => n.doubleValue()
          case other     => sys.error(s"unexpected metric type for ${r.name}: $other")
        }
        if (r.ok(v)) None else Some(Violation(r.name, v, r.bound))
      }
    }
    (out, report)
  }
}
