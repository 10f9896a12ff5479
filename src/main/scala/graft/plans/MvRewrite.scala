package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, AttributeSet, Cast, Coalesce, Divide, Expression, ExprId,
  Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.HllSketchEstimate
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, HllSketchAgg, HllUnionAgg,
  HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{
  Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Expand, Filter, Join, LogicalPlan, Project}
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
  * STAR queries — the fact joined to dimension tables under the
  * aggregate (TPC-H Q5's shape) — rewrite too, to (state ⋈ the same
  * dims), when every fact-side column the join conditions, filters and
  * grouping touch is a view group key; see the STAR section of
  * [[MvRewriteRule]] for the soundness argument and the outer-join gate.
  * GROUPING SETS / ROLLUP / CUBE (Catalyst's Aggregate-over-Expand)
  * rewrite as well — over the bare fact or over a star join — by
  * expanding the STATE instead of the fact and riding the partial
  * vector through every grouping set (the GROUPING SETS section below).
  *
  * OUT OF SCOPE by design (each declines via the gates above, never
  * rewrites wrong): DISTINCT / FILTER aggregates, aggregates over any
  * column other than the view's value column (star additionally allows
  * pure-dim min/max), filters touching non-key fact columns, grouping
  * by the value column (including via a grouping-set copy), full-outer
  * joins and outer joins that preserve the dim side. MvRewriteSpec,
  * MvStarRewriteSpec and MvExpandRewriteSpec pin a decline case for
  * each.
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
  def unregister(stateId: String): Boolean = registry.remove(stateId).isDefined
  def registeredIds: Set[String] = registry.keySet.toSet
  def clear(): Unit = registry.clear()

  // ── decline observability ─────────────────────────────────────────
  // A declining rewrite is silent by design (the query still runs, just
  // unserved); at scale that silence makes the feature undebuggable.
  // With `spark.graft.mvrewrite.explain=true` every decline logs its
  // reason AND lands in this bounded ring buffer so tooling/specs can
  // read it back without a log appender.
  private val declines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val MaxDeclines = 64
  private[plans] def noteDecline(reason: String): Unit = {
    declines.add(reason)
    while (declines.size > MaxDeclines) declines.poll()
  }
  /** Recent decline reasons, oldest first. Empty unless the explain flag
    * was on when the declining query was planned. */
  def recentDeclines: Seq[String] = declines.toArray(Array.empty[String]).toSeq
  def clearDeclines(): Unit = declines.clear()

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

  /** [[stateAggs]] plus a per-group DataSketches HLL sketch of the value
    * column — the DISTINCT-COUNT partial. Sketch registers are pure
    * per-item maxes, so the union of per-key sketches carries the same
    * information as one sketch over all rows; estimates can still drift
    * within sketch error (the union gadget estimates composite where a
    * directly-built sketch may be coupon-exact), so the rewriter serves
    * BOTH `hll_sketch_agg(v, lgK)` and `approx_count_distinct(v)` only
    * under the approx opt-in
    * (`spark.graft.mvrewrite.approxdistinct.enabled`) — the same
    * contract as [[graft.plans.ApproxSwapRule]]'s exact→approx swap.
    * The column name pins lgConfigK so a query sketching at a different
    * precision declines instead of silently serving the
    * wrong-resolution sketch. The value column must be a type
    * `hll_sketch_agg` accepts (INT/BIGINT/STRING/BINARY — Spark's own
    * constraint); sketches are not invertible, so a MAINTAINED sketch
    * view refreshes via [[graft.ops.IncrementalView.refreshRecompute]]
    * (touched groups only), never refreshDelta. */
  def stateAggsSketch(valueCol: String, lgK: Int = 12): Seq[org.apache.spark.sql.Column] =
    stateAggs(valueCol) :+
      hll_sketch_agg(col(valueCol), lit(lgK)).as(s"hll_v_$lgK")

  /** [[materialize]] with [[stateAggsSketch]] — distinct-count-capable
    * state. */
  def materializeWithSketch(
      spark: SparkSession, factPath: String, groupCols: Seq[String],
      valueCol: String, statePath: String, lgK: Int = 12): MvDef = {
    val fact = spark.read.parquet(factPath)
    val aggs = stateAggsSketch(valueCol, lgK)
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

  /** Build + persist the state table for (factPath, groupCols, valueCol)
    * and register the view. One keyed shuffle over the fact; the state is
    * one row per group-key tuple. The state relation is resolved HERE,
    * once — rewrites re-instance it without touching the filesystem.
    * An EMPTY `valueCol` builds a count-only state (`n_rows` alone —
    * the partial rewriter serves count(*) and declines the rest), the
    * shape [[graft.tools.MvAdvisor]] recommends for count-only
    * workloads. */
  def materialize(
      spark: SparkSession, factPath: String, groupCols: Seq[String],
      valueCol: String, statePath: String): MvDef = {
    val fact = spark.read.parquet(factPath)
    val aggs =
      if (valueCol.isEmpty) Seq(count(lit(1)).as("n_rows"))
      else stateAggs(valueCol)
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

  private val ExplainKey = "spark.graft.mvrewrite.explain"

  private def explainOn: Boolean = conf.getConfString(ExplainKey, "false").toBoolean

  /** Record why a candidate rewrite declined (log line + ring buffer),
    * gated on the explain flag so the hot planning path stays free of
    * string building. Returns None for inline use at decline sites. */
  private def declined[T](reason: => String): Option[T] = {
    if (explainOn) {
      val line = s"MV rewrite declined: $reason"
      logInfo(line)
      MvRewrite.noteDecline(line)
    }
    None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryRewriteStar(agg))
          .orElse(tryRewriteExpand(agg)).getOrElse(agg)
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

  /** State-side equivalent of one fact-side aggregate, or None. The
    * result's dataType must EQUAL the original's — re-aggregating a
    * partial widens decimals one level further than the original would
    * (sum(decimal(p,s)) is decimal(p+10,s), sum of that p+20), and a
    * changed type would corrupt parents that kept the old ExprId.
    * `isValue` decides whether an argument IS the view's value column —
    * name-based for the single-table path, ExprId-based for the star
    * path (a dim column that happens to share the value column's name
    * must NOT be answered from the state partials). Shared by the
    * single-table and star rewrites: the partial shapes are identical
    * because an equi-join whose fact-side keys are all view group keys
    * duplicates a state row exactly as it duplicates the fact rows the
    * partial summarizes. */
  private def partialAgg(
      ae: AggregateExpression,
      stateAttr: Map[String, AttributeReference],
      isValue: Expression => Boolean): Option[Expression] = {
    val rewritten: Option[Expression] = ae match {
      case _ if ae.isDistinct || ae.filter.isDefined => declined(
        s"aggregate ${ae.aggregateFunction.prettyName}" +
          s"${if (ae.isDistinct) " DISTINCT" else " FILTER"}: state partials cannot serve it")
      case AggregateExpression(Count(Seq(c)), _, false, _, _)
          if c.foldable && !c.nullable =>
        // count(*) / count(lit) — a NULLABLE foldable (count(NULL)) is
        // NOT total-row count and falls through to decline
        stateAttr.get("n_rows").map(a => Coalesce(Seq(
          Sum(a).toAggregateExpression(), Literal(0L))))
      case AggregateExpression(Count(Seq(c)), _, false, _, _) if isValue(c) =>
        stateAttr.get("n_vals").map(a => Coalesce(Seq(
          Sum(a).toAggregateExpression(), Literal(0L))))
      case AggregateExpression(Sum(c, _), _, false, _, _) if isValue(c) =>
        stateAttr.get("sum_v").map(a => Sum(a).toAggregateExpression())
      case AggregateExpression(Min(c), _, false, _, _) if isValue(c) =>
        stateAttr.get("min_v").map(a => Min(a).toAggregateExpression())
      case AggregateExpression(Max(c), _, false, _, _) if isValue(c) =>
        stateAttr.get("max_v").map(a => Max(a).toAggregateExpression())
      case AggregateExpression(Average(c, _), _, false, _, _) if isValue(c) =>
        for (s <- stateAttr.get("sum_v"); n <- stateAttr.get("n_vals"))
          yield Divide(
            Sum(Cast(s, DoubleType)).toAggregateExpression(),
            Cast(Sum(n).toAggregateExpression(), DoubleType))
      // distinct-count partials: HLL registers are per-item maxes, so
      // unioning the per-key sketches carries the same information as
      // one sketch over all rows — but the union gadget estimates with
      // the composite estimator where a directly-built sketch may still
      // be coupon-exact, so answers can drift within sketch error;
      // serving it therefore requires the approx opt-in. The lgK-pinned
      // state column must match the query's precision or this declines.
      case AggregateExpression(h: HllSketchAgg, _, false, _, _)
          if approxDistinctEnabled && isValue(h.left) =>
        stateAttr.get(s"hll_v_${h.lgConfigK}") match {
          case Some(a) => Some(new HllUnionAgg(a, Literal(false)).toAggregateExpression())
          case None =>
            val have = stateAttr.keys.filter(_.startsWith("hll_v_")).mkString(",")
            declined(s"hll_sketch_agg lgK=${h.lgConfigK}: state carries " +
              s"[${have}] — lgK mismatch (sketches of different precision don't union)")
        }
      // approx_count_distinct uses a DIFFERENT estimator (HLL++) than
      // the DataSketches state: serving it changes the estimate within
      // sketch error, so it requires the explicit approx opt-in — the
      // same contract as ApproxSwapRule's exact→approx swap
      case AggregateExpression(h: HyperLogLogPlusPlus, _, false, _, _)
          if approxDistinctEnabled && isValue(h.child) =>
        stateAttr.collectFirst { case (n, a) if n.startsWith("hll_v_") =>
          HllSketchEstimate(new HllUnionAgg(a, Literal(false)).toAggregateExpression())
        }
      case _ => None
    }
    rewritten.filter(_.dataType == ae.dataType)
  }

  private def approxDistinctEnabled: Boolean =
    conf.getConfString("spark.graft.mvrewrite.approxdistinct.enabled", "false").toBoolean

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
          .filter(m => m.factPaths == paths && (m.factGate(lr) || declined[Unit](
            s"view ${m.stateId}: version-pinned/time-travel fact read — " +
              "the state tracks the current version only").isDefined))
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
    if (groupNames.exists(_.isEmpty)) return declined(
      s"view ${mv.stateId}: grouping on a computed expression (bare key columns only)")
    if (!groupNames.flatten.forall(mv.groupCols.contains)) return declined(
      s"view ${mv.stateId}: grouping on ${groupNames.flatten.filterNot(mv.groupCols.contains).mkString(",")} " +
        s"not covered by view keys [${mv.groupCols.mkString(",")}]")
    // filters may reference group keys only (partials are exact per key)
    val badFilterCols = filters.flatMap(_.references.filterNot(a => mv.groupCols.contains(a.name)))
    if (badFilterCols.nonEmpty) return declined(
      s"view ${mv.stateId}: filter references non-key column(s) " +
        s"${badFilterCols.map(_.name).distinct.mkString(",")} — " +
        "key-only filters translate onto the state; a value-column filter cannot")

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

    def rewriteAgg(ae: AggregateExpression): Option[Expression] =
      partialAgg(ae, stateAttr, c => attrName(c).contains(mv.valueCol))

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

  // ── STAR rewrite ──────────────────────────────────────────────────
  //
  // An aggregate over the fact JOINED to dimension tables (TPC-H Q5's
  // shape: lineitem ⋈ supplier ⋈ nation GROUP BY n_name) is answered
  // from (state ⋈ the same dims) when every fact-side column the join
  // conditions, filters, and grouping touch is a view GROUP KEY and
  // every aggregate is on the view's value column (or count(*), or a
  // duplicate-insensitive min/max of pure dim columns).
  //
  // Soundness: a state row for key tuple k summarizes exactly the fact
  // rows with keys k. If the join sees only key columns on the fact
  // side, ALL those rows join identically, so the join duplicates (or
  // drops, or semi/anti-filters) the state row exactly as it does the
  // underlying fact rows — sum(v) = Σ sum_v, count(*) = Σ n_rows,
  // min/max = min/max of partials, avg = Σ sum_v / Σ n_vals, all
  // evaluated over the joined-state relation. Dim multiplicity needs no
  // uniqueness assumption: m matches per key multiply partials and fact
  // rows alike.
  //
  // Outer-join gate: the fact must sit on the row-PRESERVED side
  // (LeftOuter → left subtree, RightOuter → right) — an unmatched DIM
  // row on the preserved side yields one output row with NULL fact
  // columns, which count(*) counts but Σ n_rows (NULL) would not.
  // FullOuter declines. At 100 TB this rewrite replaces the fact scan +
  // fact-sized join + shuffle with a groups-sized state read joined to
  // the same dims.

  /** One qualifying substitution of the registered fact inside a join
    * tree: the tree with the fact subtree replaced by the (filtered)
    * state, plus everything needed to remap expressions above it. */
  private final case class StarMatch(
      plan: LogicalPlan,
      mv: MvDef,
      stateAttr: Map[String, AttributeReference],
      keyMap: Map[ExprId, AttributeReference],
      factOut: AttributeSet,
      valueId: Option[ExprId])

  /** All candidate fact substitutions in `plan` (fewest-group-keys view
    * first at each scan), lazily — the caller takes the first candidate
    * the full rewrite accepts, so a view that cannot serve the join keys
    * never blocks one that can. */
  private def substituteFact(plan: LogicalPlan): LazyList[StarMatch] =
    stripToScan(plan, Nil) match {
      case Some((lr, paths, filters)) =>
        registry.values.toSeq
          .filter(m => m.factPaths == paths && m.factGate(lr))
          .sortBy(m => (m.groupCols.size, m.stateId))
          .to(LazyList).flatMap { mv =>
            val keyed = filters.forall(
              _.references.forall(a => mv.groupCols.contains(a.name)))
            val state = mv.state()
            val stateAttr = state.output
              .map(a => a.name -> a.asInstanceOf[AttributeReference]).toMap
            if (!keyed || !(mv.groupCols :+ "n_rows").forall(stateAttr.contains)) None
            else {
              val keyMap = lr.output
                .filter(a => mv.groupCols.contains(a.name))
                .map(a => a.exprId -> stateAttr(a.name)).toMap
              val filtered = filters.foldLeft(state) { (p, f) =>
                Filter(f.transform {
                  case a: AttributeReference => keyMap(a.exprId)
                }, p)
              }
              Some(StarMatch(filtered, mv, stateAttr, keyMap, lr.outputSet,
                lr.output.find(_.name == mv.valueCol).map(_.exprId)))
            }
          }
      case None => plan match {
        // attribute-only Projects between joins (USING-join dedup,
        // column pruning) are DROPPED: they may carry the fact's value
        // column, which no longer exists once the fact becomes the
        // state — the enclosing Aggregate re-prunes via ColumnPruning
        case Project(es, c) if es.forall(_.isInstanceOf[AttributeReference]) =>
          substituteFact(c)
        // a Filter between joins stays in place: fact refs keys-only,
        // remapped onto the state (partials are exact per key tuple)
        case Filter(cond, c) =>
          substituteFact(c).flatMap { m =>
            val ok = cond.references.forall(
              a => !m.factOut.contains(a) || m.keyMap.contains(a.exprId))
            if (!ok) None
            else Some(m.copy(plan = Filter(cond.transform {
              case a: AttributeReference if m.keyMap.contains(a.exprId) =>
                m.keyMap(a.exprId)
            }, m.plan)))
          }
        case j @ Join(l, r, jt, cond, _) =>
          // join-type gate observability: a registered fact under a join
          // side that null-extends it can never rewrite — say so
          if (explainOn && (jt match {
                case Inner | Cross | LeftOuter | LeftSemi | LeftAnti | RightOuter => false
                case _ => true
              }) && (substituteFact(l).nonEmpty || substituteFact(r).nonEmpty))
            declined(s"join type ${jt.sql}: fact partials cannot survive a " +
              "null-extended fact side (FULL OUTER and friends decline)")
          val fromLeft = jt match {
            case Inner | Cross | LeftOuter | LeftSemi | LeftAnti =>
              substituteFact(l).map(m => m.copy(plan = j.copy(left = m.plan)))
            case _ => LazyList.empty
          }
          val fromRight = jt match {
            case Inner | Cross | RightOuter =>
              substituteFact(r).map(m => m.copy(plan = j.copy(right = m.plan)))
            case _ => LazyList.empty
          }
          (fromLeft #::: fromRight).flatMap { m =>
            // this join's condition may touch fact KEYS only, remapped
            val ok = cond.forall(_.references.forall(
              a => !m.factOut.contains(a) || m.keyMap.contains(a.exprId)))
            if (!ok) None
            else Some(m.copy(plan = m.plan match {
              case jj: Join => jj.copy(condition = jj.condition.map(_.transform {
                case a: AttributeReference if m.keyMap.contains(a.exprId) =>
                  m.keyMap(a.exprId)
              }))
              case other => other
            }))
          }
        case _ => LazyList.empty
      }
    }

  private def tryRewriteStar(agg: Aggregate): Option[LogicalPlan] =
    try {
      def strip(
          p: LogicalPlan,
          fs: List[Expression]): Option[(LogicalPlan, List[Expression])] = p match {
        case Project(es, c) if es.forall(_.isInstanceOf[AttributeReference]) =>
          strip(c, fs)
        case Filter(cond, c) => strip(c, cond :: fs)
        case j: Join => Some((j, fs))
        case _ => None
      }
      for {
        (joinRoot, midFilters) <- strip(agg.child, Nil)
        plan <- substituteFact(joinRoot)
          .flatMap(m => rewriteStarWith(agg, m, midFilters)).headOption
      } yield plan
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"MV star rewrite declined on error: ${e.getMessage}")
        None
    }

  private def rewriteStarWith(
      agg: Aggregate, m: StarMatch,
      midFilters: List[Expression]): Option[LogicalPlan] = {

    // filters between the aggregate and the join: dim refs free, fact
    // refs must be keys (partials are exact per key tuple)
    def remap(e: Expression): Option[Expression] =
      if (e.references.exists(a => m.factOut.contains(a) && !m.keyMap.contains(a.exprId)))
        None
      else Some(e.transform {
        case a: AttributeReference if m.keyMap.contains(a.exprId) => m.keyMap(a.exprId)
      })

    val filteredOpt = midFilters.foldLeft(Option(m.plan)) { (acc, f) =>
      for (p <- acc; c <- remap(f)) yield Filter(c, p)
    }

    def isValue(e: Expression): Boolean = e match {
      case a: AttributeReference => m.valueId.contains(a.exprId)
      case _ => false
    }

    def rewriteAggStar(ae: AggregateExpression): Option[Expression] =
      partialAgg(ae, m.stateAttr, isValue).orElse {
        // a pure-dim aggregate sees each (key, dim-row) pair once via the
        // state instead of n_rows times — only duplicate-INSENSITIVE
        // shapes survive that change of multiplicity
        if (ae.references.exists(m.factOut.contains) ||
          ae.isDistinct || ae.filter.isDefined) None
        else ae.aggregateFunction match {
          case _: Min | _: Max => Some(ae)
          case _ => None
        }
      }

    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rewriteAggStar(ae)
      case a: AttributeReference =>
        if (m.factOut.contains(a)) m.keyMap.get(a.exprId) else Some(a)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val groups: Seq[Option[Expression]] = agg.groupingExpressions.map {
      case a: AttributeReference =>
        if (m.factOut.contains(a)) (m.keyMap.get(a.exprId): Option[Expression])
        else Some(a)
      case _ => None // only bare columns group a star rewrite
    }

    val out: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        if (m.factOut.contains(a))
          m.keyMap.get(a.exprId).map(s => Alias(s, a.name)(exprId = a.exprId))
        else Some(a)
      case al @ Alias(child, name) =>
        rewriteExpr(child).map(c => Alias(c, name)(exprId = al.exprId))
      case _ => None
    }

    for {
      filtered <- filteredOpt
      if !groups.exists(_.isEmpty) && !out.exists(_.isEmpty)
    } yield Aggregate(groups.map(_.get), out.map(_.get), filtered)
  }

  // ── GROUPING SETS / ROLLUP / CUBE rewrite ─────────────────────────
  //
  // Catalyst plans grouping sets as Aggregate-over-Expand: Expand emits
  // one copy of every input row per grouping set, with non-grouped keys
  // replaced by NULL and a spark_grouping_id literal appended; the
  // Aggregate then groups by the (nulled) key copies + gid. A state row
  // standing for n_rows identical-key fact rows expands EXACTLY like
  // those rows do — every projection touches only group keys (bare or
  // nulled), literals, and the pass-through value column — so the same
  // partial re-aggregation serves every grouping set at once: rewrite
  // the Expand's input to the state, null the now-gone value slot, ride
  // the partial columns through every projection, and map each aggregate
  // onto them. At 100 TB a CUBE over the fact becomes a CUBE over one
  // row per group-key tuple.

  /** Inline a chain of attribute/alias Projects and Filters under an
    * Expand (the analyzer plants `k AS k#copy` grouping copies there):
    * returns the base plan (first node that is neither), the collected
    * filters, and the substitution taking every chain-level attribute
    * ExprId to the BASE attribute it carries. The base can be the fact
    * scan itself or a whole join tree — [[substituteFact]] handles
    * both, which is what lets ROLLUP/CUBE over a star join rewrite. */
  private def inlineChain(plan: LogicalPlan)
      : (LogicalPlan, List[Expression], Map[ExprId, AttributeReference]) = {
    def go(p: LogicalPlan)
        : Option[(LogicalPlan, List[Expression], Map[ExprId, AttributeReference])] =
      p match {
        case Project(exprs, c) =>
          go(c).flatMap { case (base, fs, m) =>
            val baseOut = base.outputSet
            def baseOf(a: AttributeReference): Option[AttributeReference] =
              m.get(a.exprId).orElse(if (baseOut.contains(a)) Some(a) else None)
            val entries = exprs.map {
              case a: AttributeReference => baseOf(a).map(a.exprId -> _)
              case al @ Alias(a: AttributeReference, _) => baseOf(a).map(al.exprId -> _)
              case _ => None
            }
            if (entries.exists(_.isEmpty)) None
            else Some((base, fs, m ++ entries.flatten))
          }
        case Filter(cond, c) =>
          go(c).map { case (base, fs, m) => (base, cond :: fs, m) }
        case other => Some((other, Nil, Map.empty))
      }
    go(plan).getOrElse((plan, Nil, Map.empty))
  }

  private def tryRewriteExpand(agg: Aggregate): Option[LogicalPlan] =
    try {
      agg.child match {
        case ex: Expand =>
          val (base, chainFilters, inline) = inlineChain(ex.child)
          substituteFact(base)
            .flatMap(m => rewriteExpandWith(agg, ex, m, chainFilters, inline))
            .headOption
        case _ => None
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"MV grouping-sets rewrite declined on error: ${e.getMessage}")
        None
    }

  private def rewriteExpandWith(
      agg: Aggregate, ex: Expand, m: StarMatch,
      chainFilters: List[Expression],
      inline: Map[ExprId, AttributeReference]): Option[LogicalPlan] = {

    def toBase(e: Expression): Expression = e.transform {
      case a: AttributeReference if inline.contains(a.exprId) => inline(a.exprId)
    }

    // chain filters: fact refs must be keys, remapped onto the state;
    // dim refs (star base) pass through untouched
    val filtersOk = chainFilters.forall(f => toBase(f).references.forall(
      a => !m.factOut.contains(a) || m.keyMap.contains(a.exprId)))
    if (!filtersOk) return None
    val filteredBase = chainFilters.foldLeft(m.plan) { (p, f) =>
      Filter(toBase(f).transform {
        case a: AttributeReference if m.keyMap.contains(a.exprId) => m.keyMap(a.exprId)
      }, p)
    }

    // the partial vector the state actually has (incl. any distinct-count
    // sketch) rides through EVERY projection un-nulled; fresh output
    // attrs carry it to the aggregate
    val partialNames =
      (Seq("n_rows", "n_vals", "sum_v", "min_v", "max_v") ++
        m.stateAttr.keys.filter(_.startsWith("hll_v_")).toSeq.sorted)
        .filter(m.stateAttr.contains)
    val partialOut: Map[String, AttributeReference] = partialNames.map(n =>
      n -> AttributeReference(n, m.stateAttr(n).dataType)()).toMap

    // every ExprId that carries the value column at ANY chain level
    val valueIdsAll: Set[ExprId] = m.valueId.map(vid =>
      inline.collect { case (id, b) if b.exprId == vid => id }.toSet + vid)
      .getOrElse(Set.empty)

    // every projection slot must be a fact group key (→ state key), the
    // pass-through value column (→ null — sound ONLY if the matching
    // output attr never escapes un-rewritten, enforced via `poisoned`
    // below), a dim-backed attribute (star base — rides unchanged), or
    // a literal (nulled keys, the gid)
    val nulledPositions = scala.collection.mutable.Set.empty[Int]
    val newProjections: Seq[Option[Seq[Expression]]] = ex.projections.map { proj =>
      val slots = proj.zipWithIndex.map { case (e, i) =>
        toBase(e) match {
          case a: AttributeReference if m.factOut.contains(a) =>
            if (m.keyMap.contains(a.exprId)) Some(m.keyMap(a.exprId))
            else if (m.valueId.contains(a.exprId)) {
              nulledPositions += i
              Some(Literal.create(null, a.dataType))
            } else None
          case a: AttributeReference => Some(a)
          case e2 if e2.references.isEmpty => Some(e2)
          case _ => None
        }
      }
      if (slots.exists(_.isEmpty)) None
      else Some(slots.map(_.get) ++ partialNames.map(m.stateAttr))
    }
    if (newProjections.exists(_.isEmpty)) return None

    // attrs whose slots now yield NULL: the value pass-through (any
    // chain ExprId carrying it) AND any grouping COPY of the value
    // column (fresh Expand-output ExprId — rollup("k1","v") groups by
    // such a copy); the rewrite is sound only if none of them leak into
    // the result other than through a rewritten aggregate
    val poisoned: Set[ExprId] =
      valueIdsAll ++ nulledPositions.map(i => ex.output(i).exprId)

    def rewriteAggE(ae: AggregateExpression): Option[Expression] =
      partialAgg(ae, partialOut, {
        case a: AttributeReference => valueIdsAll.contains(a.exprId)
        case _ => false
      }).orElse {
        // duplicate-insensitive aggregates of pure dim/key-copy outputs
        // (min/max of a dim attr riding the star base) pass through
        if (ae.references.exists(a => poisoned.contains(a.exprId)) ||
          ae.isDistinct || ae.filter.isDefined) None
        else ae.aggregateFunction match {
          case _: Min | _: Max => Some(ae)
          case _ => None
        }
      }

    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rewriteAggE(ae)
      case a: AttributeReference =>
        if (poisoned.contains(a.exprId)) None else Some(a)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    // grouping expressions reference Expand-produced attrs (nulled key
    // copies + gid) which survive unchanged; the value column must not
    // appear in them — directly or via a nulled grouping copy
    if (agg.groupingExpressions.exists(_.references.exists(
      a => poisoned.contains(a.exprId)))) return None

    val out: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        if (poisoned.contains(a.exprId)) None else Some(a)
      case al @ Alias(child, name) =>
        rewriteExpr(child).map(c => Alias(c, name)(exprId = al.exprId))
      case _ => None
    }
    if (out.exists(_.isEmpty)) return None

    val newExpand = Expand(
      newProjections.map(_.get),
      ex.output ++ partialNames.map(partialOut),
      filteredBase)
    Some(Aggregate(agg.groupingExpressions, out.map(_.get), newExpand))
  }
}
