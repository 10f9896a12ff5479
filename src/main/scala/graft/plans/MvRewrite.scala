package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Cast, Coalesce, Divide, Expression, Literal, NamedExpression}
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
  *     value column, no DISTINCT, no FILTER clause, and the rewritten
  *     expression's type equals the original's (decimal sums/avgs widen
  *     per level and therefore decline).
  *
  * OUT OF SCOPE by design (each declines via the gates above, never
  * rewrites wrong): joins under the aggregate (any non-Project/Filter
  * node fails `stripToScan`), GROUPING SETS / ROLLUP / CUBE (Catalyst
  * plans them as Aggregate-over-Expand — same gate), DISTINCT / FILTER
  * aggregates, aggregates over any column other than the view's value
  * column, filters touching non-key columns. MvRewriteSpec pins a
  * decline case for each.
  *
  * Freshness is the registration contract, exactly as in commercial
  * warehouses: register the view, keep it maintained, or accept stale
  * reads. Two maintained flavors ship with the engine:
  *   - [[MvRewrite.materialize]] — one-shot parquet state; the state
  *     relation is resolved ONCE at registration (no per-query reads)
  *     and re-instanced per rewrite so repeated use in one plan cannot
  *     collide on ExprIds.
  *   - [[MvRewrite.registerRollup]] — state lives in a
  *     [[graft.io.VersionedTable]] maintained incrementally
  *     ([[graft.ops.IncrementalView.refreshRecompute]] with
  *     [[MvRewrite.stateAggs]]); the provider re-resolves the CURRENT
  *     version at plan time (one manifest read, zero data-file opens),
  *     so every refresh is visible to the very next query.
  *   - [[MvRewrite.registerDeltaRollup]] — the
  *     [[graft.ops.IncrementalView.refreshDelta]] flavor: refresh from
  *     the CDF window alone (zero source scans); count/sum/avg rewrite,
  *     min/max/count(v) decline because the state simply lacks those
  *     partials — the rewriter serves what the state has.
  *
  * Conf-gated OFF by default (`spark.graft.mvrewrite.enabled`, injected
  * by [[graft.GraftExtensions]]); rewritten output attributes keep the
  * original ExprIds, so parent plans are untouched. */
object MvRewrite {

  /** A registered view: fact identity (relation root paths), its keys and
    * value column, a provider of the CURRENT state plan, and a gate run
    * against the matched fact relation before rewriting. The provider
    * must return a fresh plan (fresh ExprIds) on every call; `factGate`
    * exists because root paths alone cannot tell a TIME-TRAVEL read from
    * a current one — a versioned fact pinned to an old version must NOT
    * be answered from the current state (the rollup registrations compare
    * the scan's file list against the current version's). */
  final case class MvDef(
      factPaths: Set[String], groupCols: Seq[String], valueCol: String,
      stateId: String, state: () => LogicalPlan,
      factGate: LogicalPlan => Boolean = _ => true)

  private[plans] val registry = TrieMap.empty[String, MvDef]

  def register(mv: MvDef): Unit = registry.put(mv.stateId, mv)
  def clear(): Unit = registry.clear()

  /** The decomposable state vector for (groupCols, valueCol) — the exact
    * contract [[MvRewriteRule]] re-aggregates. Shared by [[materialize]]
    * and the incremental maintenance path
    * ([[graft.ops.IncrementalView.refreshRecompute]] takes these
    * verbatim). */
  def stateAggs(valueCol: String): Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_rows"),
    count(col(valueCol)).as("n_vals"),
    sum(col(valueCol)).as("sum_v"),
    min(col(valueCol)).as("min_v"),
    max(col(valueCol)).as("max_v"))

  /** Build + persist the state table for (factPath, groupCols, valueCol)
    * and register the view. One keyed shuffle over the fact; the state is
    * one row per group-key tuple. The state relation is resolved HERE,
    * once — rewrites re-instance it without touching the filesystem. */
  def materialize(
      spark: SparkSession, factPath: String, groupCols: Seq[String],
      valueCol: String, statePath: String): MvDef = {
    val fact = spark.read.parquet(factPath)
    val aggs = stateAggs(valueCol)
    fact.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(statePath)
    val stateRel = resolvedRelation(spark, statePath)
    val mv = MvDef(
      rootPathsOf(spark, factPath), groupCols, valueCol, statePath,
      () => stateRel.newInstance())
    register(mv)
    mv
  }

  /** Register an INCREMENTALLY MAINTAINED view: the fact is a
    * [[graft.io.VersionedTable]] read through
    * [[graft.io.VersionedTable.table]] (root path `factTablePath/data`),
    * the state a VersionedTable at `viewPath` whose rows follow
    * [[stateAggs]] — maintained by
    * [[graft.ops.IncrementalView.refreshRecompute]], so refresh cost
    * scales with the change volume, never the fact. The state provider
    * resolves the CURRENT version per plan (one manifest read); a refresh
    * committed between two queries is visible to the second. */
  def registerRollup(
      spark: SparkSession, factTablePath: String, groupCols: Seq[String],
      valueCol: String, viewPath: String): MvDef = {
    val mv = MvDef(
      Set(s"$factTablePath/data"), groupCols, valueCol, viewPath,
      () => graft.io.VersionedTable.read(spark, viewPath).queryExecution.analyzed,
      factGate = currentVersionGate(spark, factTablePath))
    register(mv)
    mv
  }

  /** True iff the matched relation reads the CURRENT version — a
    * `VERSION AS OF` / time-travel read must decline (the state tracks
    * the current version only). Scala-path scans
    * ([[graft.io.VersionedTable.table]], a V1 file relation pinned to a
    * file list) compare that list against the current manifest; catalog
    * scans ([[graft.sources.VtTable]], which always resolves the current
    * version at execution unless a time-travel identifier pinned one)
    * check the pin. */
  private def currentVersionGate(
      spark: SparkSession, factTablePath: String): LogicalPlan => Boolean = {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.inputFiles.toSet ==
          graft.io.VersionedTable.dataFiles(spark, factTablePath).toSet
      case _ => false
    }
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: graft.sources.VtTable => t.timeTravelVersion.isEmpty
        case _ => false
      }
    case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      s.relation.table match {
        case t: graft.sources.VtTable => t.timeTravelVersion.isEmpty
        case _ => false
      }
    case _ => false
  }

  /** Register a DELTA-maintained view
    * ([[graft.ops.IncrementalView.refreshDelta]] — the invertible-
    * aggregate path whose refresh is computed from the CDF window ALONE,
    * ZERO source scans): the view carries `(cnt, sum_<valueCol>)`, so
    * count(*)/sum/avg rewrite and min/max/count(v) DECLINE (the partial
    * rewriter only uses the columns the state actually has).
    *
    * Contract: `valueCol` must be null-free in the fact — the delta
    * maintains a row count, not a non-null count, so the provider equates
    * `n_vals = cnt`; a nullable value column would silently shift avg.
    * refreshDelta also sums as DOUBLE, so the fact column must be double
    * (any other type fails the rewriter's dataType-equality gate — a
    * decline, never a wrong answer). */
  def registerDeltaRollup(
      spark: SparkSession, factTablePath: String, groupCols: Seq[String],
      valueCol: String, viewPath: String): MvDef = {
    val mv = MvDef(
      Set(s"$factTablePath/data"), groupCols, valueCol, viewPath,
      () => graft.io.VersionedTable.read(spark, viewPath)
        .select(
          groupCols.map(col) ++ Seq(
            col("cnt").as("n_rows"),
            col("cnt").as("n_vals"),
            col(s"sum_$valueCol").as("sum_v")): _*)
        .queryExecution.analyzed,
      factGate = currentVersionGate(spark, factTablePath))
    register(mv)
    mv
  }

  private def resolvedRelation(spark: SparkSession, path: String): LogicalRelation =
    spark.read.parquet(path).queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation => lr
    }.getOrElse(throw new IllegalStateException(s"state at $path is not a file relation"))

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

  /** Strip attribute-only Projects and collect Filters down to a scan —
    * a V1 file relation, or a DSv2 [[graft.sources.VtTable]] relation
    * (the SQL-catalog path: `SELECT ... FROM vt.t GROUP BY ...`, whose
    * identity is the same `<table>/data` root the Scala path exposes);
    * None if anything else intervenes (joins, Expand from grouping sets,
    * subqueries — all decline here). */
  private def stripToScan(
      plan: LogicalPlan,
      filters: List[Expression]): Option[(LogicalPlan, Set[String], List[Expression])] =
    plan match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        stripToScan(child, filters)
      case Filter(cond, child) => stripToScan(child, cond :: filters)
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((lr, fs.location.rootPaths.map(_.toString).toSet, filters))
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table match {
          case t: graft.sources.VtTable =>
            Some((r, Set(s"${t.tablePath}/data"), filters))
          case _ => None
        }
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.relation.table match {
          case t: graft.sources.VtTable =>
            Some((s, Set(s"${t.tablePath}/data"), filters))
          case _ => None
        }
      case _ => None
    }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Any failure declines: an optimizer rule must never take down a
    * query (e.g. a state table dropped after registration, or a state
    * schema that stopped matching the contract). Every view registered
    * over the matched fact is a candidate — tried FEWEST-group-keys
    * first (smaller state = fewer rows read and a cheaper re-aggregate),
    * stateId as the deterministic tie-break; the first that can serve
    * the query wins, so one non-covering view never blocks another. */
  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    try {
      for {
        (lr, paths, filters) <- stripToScan(agg.child, Nil)
        mv <- registry.values.toSeq
          .filter(m => m.factPaths == paths && m.factGate(lr))
          .sortBy(m => (m.groupCols.size, m.stateId))
          .view.flatMap(m => rewriteWith(agg, m, filters)).headOption
      } yield mv
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"MV rewrite declined on error: ${e.getMessage}")
        None
    }

  private def rewriteWith(
      agg: Aggregate, mv: MvDef, filters: List[Expression]): Option[LogicalPlan] = {
    val groupNames = agg.groupingExpressions.map(attrName)
    if (groupNames.exists(_.isEmpty)) return None
    if (!groupNames.flatten.forall(mv.groupCols.contains)) return None
    // filters may reference group keys only (partials are exact per key)
    val filterRefsOk = filters.forall(_.references.forall(a => mv.groupCols.contains(a.name)))
    if (!filterRefsOk) return None

    val state = mv.state()
    val stateAttr: Map[String, AttributeReference] =
      state.output.map(a => a.name -> a.asInstanceOf[AttributeReference]).toMap
    // group keys + n_rows are the minimum contract; a state carrying only
    // part of the aggregate vector (e.g. the delta-maintained rollup has
    // no min_v/max_v) serves the aggregates it has and declines the rest
    if (!(mv.groupCols :+ "n_rows").forall(stateAttr.contains)) return None

    def onState(e: Expression): Expression = e.transform {
      case a: AttributeReference => stateAttr(a.name)
    }

    /** State-side equivalent of one fact-side aggregate, or None. The
      * result's dataType must EQUAL the original's — re-aggregating a
      * partial widens decimals one level further than the original would
      * (sum(decimal(p,s)) is decimal(p+10,s), sum of that p+20), and a
      * changed type would corrupt parents that kept the old ExprId. */
    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      val rewritten: Option[Expression] = ae match {
        case _ if ae.isDistinct || ae.filter.isDefined => None
        case AggregateExpression(Count(Seq(c)), _, false, _, _)
            if c.foldable && !c.nullable =>
          // count(*) / count(lit) — a NULLABLE foldable (count(NULL)) is
          // NOT total-row count and falls through to decline
          stateAttr.get("n_rows").map(a => Coalesce(Seq(
            Sum(a).toAggregateExpression(), Literal(0L))))
        case AggregateExpression(Count(Seq(c)), _, false, _, _)
            if attrName(c).contains(mv.valueCol) =>
          stateAttr.get("n_vals").map(a => Coalesce(Seq(
            Sum(a).toAggregateExpression(), Literal(0L))))
        case AggregateExpression(Sum(c, _), _, false, _, _)
            if attrName(c).contains(mv.valueCol) =>
          stateAttr.get("sum_v").map(a => Sum(a).toAggregateExpression())
        case AggregateExpression(Min(c), _, false, _, _)
            if attrName(c).contains(mv.valueCol) =>
          stateAttr.get("min_v").map(a => Min(a).toAggregateExpression())
        case AggregateExpression(Max(c), _, false, _, _)
            if attrName(c).contains(mv.valueCol) =>
          stateAttr.get("max_v").map(a => Max(a).toAggregateExpression())
        case AggregateExpression(Average(c, _), _, false, _, _)
            if attrName(c).contains(mv.valueCol) =>
          for (s <- stateAttr.get("sum_v"); n <- stateAttr.get("n_vals"))
            yield Divide(
              Sum(Cast(s, DoubleType)).toAggregateExpression(),
              Cast(Sum(n).toAggregateExpression(), DoubleType))
        case _ => None
      }
      rewritten.filter(_.dataType == ae.dataType)
    }

    /** Pre-order rewrite with Option failure: AggregateExpressions are
      * handled as WHOLE subtrees before their children are ever visited
      * (a naive transformUp reaches the value-column attribute inside
      * sum(v) first and wrongly vetoes the rewrite); attribute refs
      * OUTSIDE any aggregate must be group keys. */
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rewriteAgg(ae)
      case a: AttributeReference =>
        if (mv.groupCols.contains(a.name)) Some(stateAttr(a.name)) else None
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    // each original output expression gets a state-side equivalent,
    // aliased back to the ORIGINAL name + ExprId so parents are untouched
    val rewrittenOut: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) =>
        Some(Alias(stateAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(child, name) =>
        rewriteExpr(child).map(c => Alias(c, name)(exprId = al.exprId))
      case _ => None
    }
    if (rewrittenOut.exists(_.isEmpty)) return None

    val filtered = filters.foldLeft(state) { (p, f) => Filter(onState(f), p) }
    val newGrouping = agg.groupingExpressions.map(onState)
    Some(Aggregate(newGrouping, rewrittenOut.map(_.get), filtered))
  }
}
