package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view feedback loop — the MV twin of [[LayoutAdvisor]]:
  * observe the workload's AGGREGATE shapes and recommend the views
  * [[graft.plans.MvRewrite]] can serve. Report only — materializing a
  * view over a 100 TB fact is a deliberate act; the advisor emits the
  * evidence, [[MvAdvisor.materializeTop]] pulls the trigger when asked.
  *
  * Observation is a plan walk: every `Aggregate` whose child strips to a
  * file scan (attribute-only Projects and Filters in between — the same
  * discipline [[graft.plans.MvRewriteRule]] rewrites through) and whose
  * aggregates are all rewritable shapes — count(*) or
  * count/sum/min/max/avg over ONE bare fact column — counts one
  * observation of (table, groupKeys ∪ filterKeys, valueCol). Filter
  * columns join the key set because the rewriter can only translate
  * group-KEY filters onto the state: a view missing a filtered column
  * can never serve the query.
  *
  * Recommendation policy (deterministic, spec-pinned): per (table,
  * valueCol), rank key columns by observation-weighted frequency
  * (alphabetical tie-break) and take the top `maxKeys`; coverage =
  * observations whose keys ⊆ the chosen set (the rewriter regroups any
  * key SUBSET from the state). Recommendations rank by covered
  * observations and must clear `minShare`. The state is one row per key
  * tuple — the advisor reports the key set, the caller weighs its
  * cardinality (e.g. via [[graft.ops.TableStats]]) before
  * materializing. */
object MvAdvisor {

  /** One observed aggregate: key columns (grouping + filters), value
    * column ("" = count(*)-only query, servable by ANY view on the
    * table with covering keys). */
  final case class Obs(table: String, keys: Set[String], valueCol: String)

  private val counts = TrieMap.empty[Obs, Long]

  def clear(): Unit = counts.clear()

  /** Extract the rewritable-aggregate observations from one query plan
    * (without recording them). */
  def observe(df: DataFrame): Seq[Obs] = {
    val out = Seq.newBuilder[Obs]
    df.queryExecution.optimizedPlan.foreach {
      case agg: Aggregate =>
        stripToScan(agg.child, Nil) match {
          case Some((root, filters)) =>
            val groupNames = agg.groupingExpressions.map {
              case a: AttributeReference => Some(a.name)
              case _ => None
            }
            val filterCols = filters.flatMap(_.references.map(_.name)).toSet
            if (!groupNames.exists(_.isEmpty)) {
              valueAttrsOf(agg) match {
                // > 1 value column can never rewrite against a
                // single-value state — not a servable observation
                case Some(values) if values.size <= 1 =>
                  val keys = groupNames.flatten.toSet ++ filterCols
                  out += Obs(root, keys, values.headOption.map(_.name).getOrElse(""))
                case _ => ()
              }
            }
          case None => observeStar(agg).foreach(out += _)
        }
      case _ => ()
    }
    out.result()
  }

  /** STAR observation — the advisor twin of the rewriter's join path:
    * an aggregate over inner joins where every rewritable aggregate
    * targets ONE scan (the fact) yields an observation whose keys are
    * the fact columns used anywhere outside the aggregates (join
    * conditions, filters, grouping) — exactly the columns a serving
    * view must carry. Declines (observes nothing) when the value
    * column itself leaks into a key position. */
  private def observeStar(agg: Aggregate): Option[Obs] = {
    def strip(p: LogicalPlan, fs: List[Expression]): (LogicalPlan, List[Expression]) =
      p match {
        case Project(es, c) if es.forall(_.isInstanceOf[AttributeReference]) =>
          strip(c, fs)
        case Filter(cond, c) => strip(c, cond :: fs)
        case other => (other, fs)
      }
    def flatten(p: LogicalPlan)
        : Option[(Seq[(String, LogicalRelation)], List[Expression])] = p match {
      case Project(es, c) if es.forall(_.isInstanceOf[AttributeReference]) => flatten(c)
      case Filter(cond, c) => flatten(c).map { case (ls, es) => (ls, cond :: es) }
      case Join(l, r, Inner | Cross, cond, _) =>
        for ((ll, le) <- flatten(l); (rl, re) <- flatten(r))
          yield (ll ++ rl, cond.toList ++ le ++ re)
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((Seq((fs.location.rootPaths.map(_.toString).sorted.mkString(","), lr)), Nil))
      // anything else (LocalRelation dims, subquery aggregates…) is an
      // opaque non-fact subtree; a fact buried inside one is simply not
      // observed — conservative, never wrong
      case _ => Some((Seq.empty, Nil))
    }
    val (root, midFilters) = strip(agg.child, Nil)
    root match {
      case j: Join =>
        for {
          (scans, innerExprs) <- flatten(j)
          values <- valueAttrsOf(agg)
          if values.size == 1
          value = values.head
          (factRoot, factRel) <- scans.find(_._2.outputSet.contains(value))
          factOut = factRel.outputSet
          keyRefs = (innerExprs ++ midFilters ++ agg.groupingExpressions)
            .flatMap(_.references).filter(factOut.contains)
          // the value column leaking into a key position is unservable
          if !keyRefs.exists(_.exprId == value.exprId)
        } yield Obs(factRoot, keyRefs.map(_.name).toSet, value.name)
      case _ => None
    }
  }

  /** Record a query into the session-level workload model. */
  def record(df: DataFrame): Unit =
    observe(df).foreach { o =>
      counts.updateWith(o) { case Some(n) => Some(n + 1); case None => Some(1L) }
    }

  final case class Recommendation(
      table: String, groupCols: Seq[String], valueCol: String,
      covered: Long, observed: Long) {
    def render: String =
      s"""view over $table:
         |  groupCols: ${groupCols.mkString(", ")}
         |  valueCol:  ${if (valueCol.isEmpty) "(count-only)" else valueCol}
         |  serves $covered of $observed observed aggregates on this (table, value)""".stripMargin
  }

  /** Rank the recorded workload into view recommendations, most-covering
    * first. `minShare`: a recommendation must cover at least this share
    * of its (table, valueCol) observations (one ad-hoc rollup should not
    * earn a fact-wide materialization). */
  def recommend(minShare: Double = 0.5, maxKeys: Int = 4): Seq[Recommendation] = {
    val all = counts.toSeq
    // count(*)-only observations ("" value) are servable by ANY view on
    // the table with covering keys: credit them to every valued target,
    // and emit a count-only recommendation only for tables with no
    // valued aggregates at all
    val countOnly = all.filter(_._1.valueCol.isEmpty).groupBy(_._1.table)
    val valuedTables = all.collect {
      case (o, _) if o.valueCol.nonEmpty => o.table
    }.toSet
    val byTarget = all
      .filter { case (o, _) => o.valueCol.nonEmpty || !valuedTables(o.table) }
      .groupBy { case (o, _) => (o.table, o.valueCol) }
      .map { case ((table, value), obs) =>
        val credited =
          if (value.nonEmpty) obs ++ countOnly.getOrElse(table, Seq.empty)
          else obs
        ((table, value), credited)
      }
    val recs = byTarget.toSeq.flatMap { case ((table, value), obs) =>
      val total = obs.map(_._2).sum
      // observation-weighted column frequency, greedy grow
      val colWeight = obs.flatMap { case (o, n) => o.keys.map(_ -> n) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ranked = colWeight.toSeq.sortBy { case (c, n) => (-n, c) }.map(_._1)
      val chosen = ranked.take(maxKeys)
      val covered = obs.collect {
        case (o, n) if o.keys.subsetOf(chosen.toSet) => n
      }.sum
      if (covered.toDouble / total.max(1L) >= minShare)
        Some(Recommendation(table, chosen.sorted, value, covered, total))
      else None
    }
    recs.sortBy(r => (-r.covered, r.table, r.valueCol))
  }

  /** The full report for logging/review. */
  def report(minShare: Double = 0.5): String =
    recommend(minShare).map(_.render).mkString("\n\n") match {
      case "" => "(no rewritable aggregates recorded)"
      case s => s
    }

  /** Close the loop: materialize + register the TOP recommendation for
    * `table` via [[graft.plans.MvRewrite.materialize]] — after this, the
    * observed queries rewrite to the state (count-only recommendations
    * build the n_rows-only state). Returns the registered view. */
  def materializeTop(
      spark: SparkSession, table: String,
      statePath: String): Option[graft.plans.MvRewrite.MvDef] = {
    // recorded identities are scheme-qualified scan roots
    // ("file:/tmp/.../fact"); accept the caller's bare path form
    def bare(s: String) = s.stripPrefix("file:")
    recommend().find(_.table.split(",").exists(r => bare(r) == bare(table))).map { r =>
      graft.plans.MvRewrite.materialize(spark, table, r.groupCols, r.valueCol, statePath)
    }
  }

  // ---- plan walking (MvRewriteRule's stripping discipline) -------------

  @scala.annotation.tailrec
  private def stripToScan(
      plan: LogicalPlan,
      filters: List[Expression]): Option[(String, List[Expression])] = plan match {
    case Project(es, child) if es.forall(_.isInstanceOf[AttributeReference]) =>
      stripToScan(child, filters)
    case Filter(cond, child) => stripToScan(child, cond :: filters)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some((fs.location.rootPaths.map(_.toString).sorted.mkString(","), filters))
    case _ => None
  }

  /** The distinct bare columns aggregated over, when EVERY aggregate is
    * a rewritable shape — None otherwise. count(*) contributes no
    * column (an empty result = count-only query). */
  private def valueAttrsOf(agg: Aggregate): Option[Set[AttributeReference]] = {
    var ok = true
    val cols = Set.newBuilder[AttributeReference]
    agg.aggregateExpressions.foreach { ne =>
      def walk(e: Expression): Unit = e match {
        case ae: AggregateExpression if ae.isDistinct || ae.filter.isDefined =>
          ok = false
        case AggregateExpression(f, _, false, _, _) => f match {
          case Count(Seq(c)) if c.foldable => ()
          case Count(Seq(a: AttributeReference)) => cols += a
          case Sum(a: AttributeReference, _) => cols += a
          case Min(a: AttributeReference) => cols += a
          case Max(a: AttributeReference) => cols += a
          case Average(a: AttributeReference, _) => cols += a
          case _ => ok = false
        }
        case other => other.children.foreach(walk)
      }
      ne match {
        case _: AttributeReference => ()
        case Alias(child, _) => walk(child)
        case _ => ok = false
      }
    }
    val built = cols.result()
    if (ok) Some(built) else None
  }
}
