package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Materialized-view AUTO-REWRITE — the flagship OLAP warehouse feature:
  * a user's plain aggregate over the fact table is transparently answered
  * from a pre-aggregated state table when a registered view covers it.
  * At 100 TB the difference is a full fact scan + shuffle versus a read
  * of one row per group.
  *
  * The state table is the decomposable-aggregate vector per group-key
  * tuple — `(n_rows, n_vals, sum_v, min_v, max_v)` — so any query that
  * groups by a SUBSET of the view's keys re-aggregates the state:
  * `count(*)→Σ n_rows`, `count(v)→Σ n_vals`, `sum→Σ sum_v`,
  * `min/max→min/max of partials`, `avg→Σ sum_v / Σ n_vals` (n_vals, not
  * n_rows — null values don't count toward the mean). Group-key-only
  * filters are sound (partials are exact per key) and are translated onto
  * the state scan, where the ordinary pushdown rules take over.
  *
  * Soundness gates — the rewrite declines unless ALL hold:
  *   - the aggregate's child is the registered fact scan (file-set
  *     identity on the relation's root paths), possibly under
  *     attribute-only Projects and group-key-only Filters;
  *   - grouping expressions are bare fact columns ⊆ the view's keys;
  *   - every aggregate is one of the five shapes above on the view's
  *     value column, no DISTINCT, no FILTER clause.
  *
  * Freshness is the registration contract, exactly as in commercial
  * warehouses: register the view, keep it maintained (the incremental
  * machinery in [[graft.ops.MaterializedRollup]] /
  * [[graft.ops.IncrementalView]] exists for precisely that), or accept
  * stale reads. Conf-gated OFF by default (`spark.graft.mvrewrite
  * .enabled`); rewritten output attributes keep the original ExprIds, so
  * parent plans are untouched. */
object MvRewrite {

  final case class MvDef(
      factPaths: Set[String], groupCols: Seq[String], valueCol: String,
      statePath: String)

  private[plans] val registry = TrieMap.empty[String, MvDef]

  def register(mv: MvDef): Unit = registry.put(mv.statePath, mv)
  def clear(): Unit = registry.clear()

  /** Build + persist the state table for (factPath, groupCols, valueCol)
    * and register the view. One keyed shuffle over the fact; the state is
    * one row per group-key tuple. */
  def materialize(
      spark: SparkSession, factPath: String, groupCols: Seq[String],
      valueCol: String, statePath: String): MvDef = {
    val fact = spark.read.parquet(factPath)
    fact.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col(valueCol)).as("n_vals"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
      .write.mode("overwrite").parquet(statePath)
    val mv = MvDef(rootPathsOf(spark, factPath), groupCols, valueCol, statePath)
    register(mv)
    mv
  }

  private def rootPathsOf(spark: SparkSession, path: String): Set[String] =
    spark.read.parquet(path).queryExecution.analyzed.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString).toSet
    }.headOption.getOrElse(Set(path))
}

object MvRewriteRule extends Rule[LogicalPlan] {

  import MvRewrite._

  private val ConfKey = "spark.graft.mvrewrite.enabled"

  private def enabled: Boolean = conf.getConfString(ConfKey, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Strip attribute-only Projects and collect Filters down to a file
    * relation; None if anything else intervenes. */
  private def stripToScan(
      plan: LogicalPlan,
      filters: List[Expression]): Option[(LogicalRelation, Set[String], List[Expression])] =
    plan match {
      case p @ Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        stripToScan(child, filters)
      case Filter(cond, child) => stripToScan(child, cond :: filters)
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((lr, fs.location.rootPaths.map(_.toString).toSet, filters))
      case _ => None
    }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (_, paths, filters) <- stripToScan(agg.child, Nil)
      mv <- registry.values.find(_.factPaths == paths)
      plan <- rewriteWith(agg, mv, filters)
    } yield plan
  }

  private def rewriteWith(
      agg: Aggregate, mv: MvDef, filters: List[Expression]): Option[LogicalPlan] = {
    val groupNames = agg.groupingExpressions.map(attrName)
    if (groupNames.exists(_.isEmpty)) return None
    if (!groupNames.flatten.forall(mv.groupCols.contains)) return None
    // filters may reference group keys only
    val filterRefsOk = filters.forall(_.references.forall(a => mv.groupCols.contains(a.name)))
    if (!filterRefsOk) return None

    val spark = SparkSession.active
    val state = spark.read.parquet(mv.statePath).queryExecution.analyzed
    val stateAttr: Map[String, AttributeReference] =
      state.output.map(a => a.name -> a.asInstanceOf[AttributeReference]).toMap

    def onState(e: Expression): Expression = e.transform {
      case a: AttributeReference => stateAttr(a.name)
    }

    // each original output expression gets a state-side equivalent,
    // aliased back to the ORIGINAL name + ExprId so parents are untouched
    def rewriteAgg(fn: Expression): Option[Expression] = fn match {
      case ae: AggregateExpression if ae.isDistinct || ae.filter.isDefined => None
      case AggregateExpression(Count(Seq(c)), _, false, _, _) if c.foldable =>
        Some(Coalesce(Seq(
          Sum(stateAttr("n_rows")).toAggregateExpression(), Literal(0L))))
      case AggregateExpression(Count(Seq(c)), _, false, _, _)
          if attrName(c).contains(mv.valueCol) =>
        Some(Coalesce(Seq(
          Sum(stateAttr("n_vals")).toAggregateExpression(), Literal(0L))))
      case AggregateExpression(Sum(c, _), _, false, _, _)
          if attrName(c).contains(mv.valueCol) =>
        Some(Sum(stateAttr("sum_v")).toAggregateExpression())
      case AggregateExpression(Min(c), _, false, _, _)
          if attrName(c).contains(mv.valueCol) =>
        Some(Min(stateAttr("min_v")).toAggregateExpression())
      case AggregateExpression(Max(c), _, false, _, _)
          if attrName(c).contains(mv.valueCol) =>
        Some(Max(stateAttr("max_v")).toAggregateExpression())
      case AggregateExpression(Average(c, _), _, false, _, _)
          if attrName(c).contains(mv.valueCol) =>
        Some(Cast(
          Sum(Cast(stateAttr("sum_v"), DoubleType)).toAggregateExpression(), DoubleType)
          match {
            case s =>
              org.apache.spark.sql.catalyst.expressions.Divide(
                s,
                Cast(Sum(stateAttr("n_vals")).toAggregateExpression(), DoubleType))
          })
      case _ => None
    }

    val rewrittenOut: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) =>
        Some(Alias(stateAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(child, name) =>
        val hasAgg = child.exists(_.isInstanceOf[AggregateExpression])
        if (!hasAgg) {
          // non-aggregate projection (e.g. aliased group key)
          if (child.references.forall(r => mv.groupCols.contains(r.name)))
            Some(Alias(onState(child), name)(exprId = al.exprId))
          else None
        } else {
          // rewrite every embedded aggregate; fail the whole alias if any
          // embedded aggregate is unsupported
          var ok = true
          val newChild = child.transformUp {
            case ae: AggregateExpression =>
              rewriteAgg(ae) match {
                case Some(r) => r
                case None => ok = false; ae
              }
            case a: AttributeReference =>
              if (mv.groupCols.contains(a.name)) stateAttr(a.name)
              else { ok = false; a }
          }
          if (ok) Some(Alias(newChild, name)(exprId = al.exprId)) else None
        }
      case _ => None
    }
    if (rewrittenOut.exists(_.isEmpty)) return None

    val filtered = filters.foldLeft(state) { (p, f) => Filter(onState(f), p) }
    val newGrouping = agg.groupingExpressions.map(onState)
    Some(Aggregate(newGrouping, rewrittenOut.map(_.get), filtered))
  }
}
