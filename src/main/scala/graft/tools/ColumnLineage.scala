package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Column-level lineage: which LEAF (table, column) inputs feed each
  * output column of a DataFrame — the governance/impact-analysis question
  * ("which outputs break if we deprecate lineitem.l_discount?") answered
  * from the ANALYZED logical plan, before any optimizer rewrite.
  *
  * One bottom-up pass threads a map ExprId → {leaf columns} through the
  * plan: leaves seed their own attributes; nodes that DEFINE attributes
  * (Project/Aggregate aliases, window expressions, generator output,
  * Expand projections, Union positional merge) map the new ExprIds to the
  * union of their referenced inputs' leaf sets; every other node passes
  * child attributes through untouched. Unhandled defining nodes
  * over-approximate (all expression references) rather than dropping
  * lineage, so the answer errs toward "might depend on".
  *
  * Driver-side plan traversal only — cost is plan size, never data.
  */
object ColumnLineage {

  /** output column name → set of "table.column" leaf inputs. */
  def of(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[String])).toMap
  }

  /** Report form: one row per (out_col, src) dependency edge, sorted —
    * the shape a catalog ingests. */
  def report(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    of(df).toSeq
      .flatMap { case (out, srcs) => srcs.toSeq.sorted.map(out -> _) }
      .sortBy(identity)
      .toDF("out_col", "src")
  }

  private def leafLabel(p: LogicalPlan): String = p match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).orElse {
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.headOption.map { rp =>
              rp.getName.replaceAll("\\.(parquet|csv|json|orc)$", "")
            }
          case _ => None
        }
      }.getOrElse("relation")
    case r: DataSourceV2Relation => r.table.name()
    case _: LocalRelation        => "inline"
    case other                   => other.nodeName.toLowerCase
  }

  private def build(plan: LogicalPlan): Map[ExprId, Set[String]] = plan match {
    case leaf: LeafNode =>
      val label = leafLabel(leaf)
      leaf.output.map(a => a.exprId -> Set(s"$label.${a.name}")).toMap
    case other =>
      val childMap: Map[ExprId, Set[String]] =
        other.children.map(build).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
      def refs(e: Expression): Set[String] =
        e.references.toSeq.flatMap(a => childMap.getOrElse(a.exprId, Set.empty[String])).toSet
      def named(nes: Seq[NamedExpression]): Map[ExprId, Set[String]] =
        nes.map(ne => ne.exprId -> refs(ne)).toMap
      val self: Map[ExprId, Set[String]] = other match {
        case p: Project   => named(p.projectList)
        case a: Aggregate => named(a.aggregateExpressions)
        case w: Window    => named(w.windowExpressions)
        case g: Generate =>
          g.generatorOutput.map(a => a.exprId -> refs(g.generator)).toMap
        case e: Expand =>
          e.output.zipWithIndex.map { case (a, i) =>
            a.exprId -> e.projections.flatMap(p => refs(p(i))).toSet
          }.toMap
        case u: Union =>
          u.output.zipWithIndex.map { case (a, i) =>
            a.exprId -> u.children.flatMap(c =>
              childMap.getOrElse(c.output(i).exprId, Set.empty[String])).toSet
          }.toMap
        case _ => Map.empty
      }
      val merged = childMap ++ self
      // over-approximate any attribute an unhandled node invented, so
      // lineage degrades to "depends on everything referenced", never to
      // silently-missing
      val missing = other.output.filterNot(a => merged.contains(a.exprId))
      merged ++ missing.map(a =>
        a.exprId -> other.expressions.flatMap(refs).toSet).toMap
  }
}
