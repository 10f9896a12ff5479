package graft.sources

import scala.annotation.tailrec

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction,
  MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.StructType

import graft.io.VersionedTable

/** SQL DML for [[VersionedTable]] (VERDICT r9 item 3): `MERGE INTO`,
  * `DELETE FROM`, and `UPDATE` statement text against a [[VtCatalog]]
  * table resolves to [[VersionedTable.merge]] /
  * [[VersionedTable.deleteWhere]] / [[VersionedTable.updateWhere]] — the same
  * interception-at-resolution pattern Delta uses (the analyzer's standard
  * row-level rewrite requires `SupportsRowLevelOperations`; intercepting
  * the resolved command instead reuses the library's manifest-race commit
  * paths, file-surgery pruning and CHECK enforcement verbatim).
  *
  * The target is treated as KEYED by the ON columns — the
  * [[VersionedTable.merge]] contract: if the owner committed duplicate
  * rows under one key, ALL of them are replaced by the single matched
  * source row (standard SQL would update each copy). This is the keyed-
  * entity semantics every other merge consumer of the table already
  * gets; neither UPDATE nor INSERT may reassign a merge key (checked at
  * lowering — a key-changing assignment would retarget or replace a row
  * instead of updating/inserting).
  *
  * Supported MERGE shape (anything else fails fast with a clear error,
  * never silently mis-merges):
  *   - `ON` is a conjunction of equalities, each between one target
  *     column and one source-side expression (the merge keys);
  *   - matched actions: at most one `UPDATE SET ...` assigning EVERY
  *     target column and at most one `DELETE`, each optionally
  *     conditional on SOURCE columns; SQL's first-match-wins order is
  *     honored;
  *   - not-matched actions: at most one `INSERT` assigning every target
  *     column, optionally conditional on source columns;
  *   - no `NOT MATCHED BY SOURCE` clauses, no schema evolution.
  *
  * Conditions may reference the source only because the lowering decides
  * each source row's fate BEFORE the merge: one broadcast-sized semi-join
  * against the target's distinct keys marks each row matched/unmatched,
  * then matched rows become tombstones (`DELETE`), full replacement rows
  * (`UPDATE SET`), or are dropped (leave the target row untouched), and
  * unmatched rows become inserts or are dropped. The resulting batch
  * rides [[VersionedTable.merge]]'s stats+bloom file pruning — at 100 TB
  * a CDC batch rewrites only the files its keys actually live in.
  *
  * DELETE and UPDATE accept ARBITRARY predicates (not just
  * V1-translatable ones): the resolved condition — and UPDATE's
  * assignment values, which read the OLD row per SQL semantics — are
  * rebound by name onto the table's own scan, where the manifest-range
  * pruning inside [[VersionedTable.deleteWhere]] /
  * [[VersionedTable.updateWhere]] decides which files rewrite. [[VtTable]]
  * additionally implements the standard `SupportsDelete` seam so
  * translatable deletes work even without [[graft.GraftExtensions]]
  * injected. */
object VtDmlRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved =>
      vtTarget(m.targetTable) match {
        case Some((table, relation)) => lowerMerge(m, table, relation)
        case None => plan
      }
    case d @ DeleteFromTable(target, condition) if d.resolved =>
      vtTarget(target) match {
        case Some((table, _)) =>
          VtDeleteCommand(table.tablePath, new VtExprHolder(condition))
        case None => plan
      }
    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      vtTarget(target) match {
        case Some((table, _)) =>
          val assigns = assignments.map {
            case a if a.key.isInstanceOf[AttributeReference] =>
              a.key.asInstanceOf[AttributeReference].name -> a.value
            case a => fail(s"UPDATE SET assigns a non-column key: ${a.key.sql}")
          }
          VtUpdateCommand(
            table.tablePath,
            new VtAssignHolder(assigns,
              condition.getOrElse(
                org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)))
        case None => plan
      }
    case _ => plan
  }

  @tailrec private def vtTarget(p: LogicalPlan): Option[(VtTable, DataSourceV2Relation)] =
    p match {
      case SubqueryAlias(_, child) => vtTarget(child)
      case r: DataSourceV2Relation => r.table match {
        case t: VtTable =>
          require(t.timeTravelVersion.isEmpty,
            s"cannot run DML against time-travel identifier ${t.name()}")
          Some((t, r))
        case _ => None
      }
      case _ => None
    }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"graft MERGE INTO: $msg")

  private def lowerMerge(
      m: MergeIntoTable, table: VtTable, relation: DataSourceV2Relation): LogicalPlan = {
    if (m.withSchemaEvolution) fail("WITH SCHEMA EVOLUTION is not supported")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")

    val targetAttrs = relation.outputSet
    val sourceOut = m.sourceTable.outputSet
    def sourceOnly(e: Expression): Boolean = e.references.subsetOf(sourceOut)

    // ON: conjunction of target-column = source-expression
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys: Seq[(String, Expression)] = conjuncts(m.mergeCondition).map {
      case EqualTo(t: AttributeReference, s) if targetAttrs.contains(t) && sourceOnly(s) =>
        t.name -> s
      case EqualTo(s, t: AttributeReference) if targetAttrs.contains(t) && sourceOnly(s) =>
        t.name -> s
      case other => fail(
        s"ON must be a conjunction of target-column = source-expression equalities, got: ${other.sql}")
    }
    if (keys.map(_._1).distinct.size != keys.size) fail("duplicate key column in ON")

    m.matchedActions.foreach {
      case u: UpdateAction => u.condition.foreach(c =>
        if (!sourceOnly(c)) fail(s"UPDATE condition may reference the source only: ${c.sql}"))
      case d: DeleteAction => d.condition.foreach(c =>
        if (!sourceOnly(c)) fail(s"DELETE condition may reference the source only: ${c.sql}"))
      case other => fail(s"unsupported matched action: $other")
    }
    if (m.matchedActions.count(_.isInstanceOf[UpdateAction]) > 1)
      fail("at most one WHEN MATCHED ... UPDATE is supported")
    if (m.matchedActions.count(_.isInstanceOf[DeleteAction]) > 1)
      fail("at most one WHEN MATCHED ... DELETE is supported")
    val insertAction = m.notMatchedActions match {
      case Seq() => None
      case Seq(i: InsertAction) =>
        i.condition.foreach(c =>
          if (!sourceOnly(c)) fail(s"INSERT condition may reference the source only: ${c.sql}"))
        Some(i)
      case other => fail(s"at most one WHEN NOT MATCHED ... INSERT is supported, got: $other")
    }

    // full-row assignment check: every target column must be assigned,
    // every value a source-side expression
    val targetSchema = relation.schema
    def assignMap(assigns: Seq[(Expression, Expression)], what: String): Map[String, Expression] = {
      val byName = assigns.map {
        case (k: AttributeReference, v) if targetAttrs.contains(k) =>
          if (!sourceOnly(v)) fail(s"$what value may reference the source only: ${v.sql}")
          k.name -> v
        case (k, _) => fail(s"$what assigns a non-column key: ${k.sql}")
      }.toMap
      val missing = targetSchema.fieldNames.filterNot(byName.contains)
      if (missing.nonEmpty) fail(
        s"$what must assign every target column (full-row semantics); missing: ${missing.mkString(",")}")
      byName
    }
    m.matchedActions.collectFirst { case u: UpdateAction =>
      val am = assignMap(u.assignments.map(a => a.key -> a.value), "UPDATE SET")
      // UPDATE may not reassign a merge key: the lowering applies updates
      // BY key, so a key-changing SET would silently retarget the row
      // instead of updating the matched one
      keys.foreach { case (k, e) =>
        if (!am(k).semanticEquals(e)) fail(
          s"UPDATE SET must not reassign merge key '$k' " +
            s"(SET $k = ${am(k).sql}, but ON matches on ${e.sql})")
      }
      am
    }
    insertAction.foreach { i =>
      val am = assignMap(i.assignments.map(a => a.key -> a.value), "INSERT")
      // INSERT may not reassign a merge key either: the lowering feeds a
      // keyed upsert, so an insert row whose key differs from the ON
      // expression would REPLACE an existing row that happens to carry
      // that key instead of inserting alongside it
      keys.foreach { case (k, e) =>
        if (!am(k).semanticEquals(e)) fail(
          s"INSERT must not reassign merge key '$k' " +
            s"(INSERT sets $k = ${am(k).sql}, but ON matches on ${e.sql})")
      }
    }

    VtMergeCommand(
      table.tablePath, targetSchema,
      new VtMergeSpecHolder(keys, m.matchedActions, insertAction, m.sourceTable))
  }
}

/** Opaque holders: these carry RESOLVED expressions whose references live
  * in the source plan, not in the command's (empty) child list — a plain
  * class keeps them out of TreeNode's product reflection so checkAnalysis
  * does not flag them as missing inputs. */
final class VtMergeSpecHolder(
    val keys: Seq[(String, Expression)],
    val matchedActions: Seq[MergeAction],
    val insertAction: Option[InsertAction],
    val source: LogicalPlan) extends Serializable

final class VtExprHolder(val expr: Expression) extends Serializable

final class VtAssignHolder(
    val assigns: Seq[(String, Expression)], val cond: Expression) extends Serializable

final case class VtMergeCommand(
    path: String, targetSchema: StructType, spec: VtMergeSpecHolder)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val src = bridge.ofRows(spark, spec.source)
    val keyNames = spec.keys.map(_._1)
    val flag = "__vt_del"

    // FAST PATH — the common CDC shape `WHEN MATCHED THEN UPDATE SET * /
    // WHEN NOT MATCHED THEN INSERT *` (no conditions, no DELETE, update
    // and insert projecting the same row): every source row's fate is
    // "upsert" regardless of matched status, so the matched-flag join —
    // and with it a full scan of the target's key column — is skipped
    // entirely; VersionedTable.merge's stats+bloom pruning is then the
    // only target read.
    val unconditional =
      spec.matchedActions.forall {
        case u: UpdateAction => u.condition.isEmpty
        case d: DeleteAction => d.condition.isEmpty
        case _ => false
      } && spec.insertAction.forall(_.condition.isEmpty)
    val updOnly = spec.matchedActions.collect { case u: UpdateAction => u }
    val sameProjection = (updOnly, spec.insertAction) match {
      case (Seq(u), Some(i)) =>
        val um = u.assignments.map(a =>
          a.key.asInstanceOf[AttributeReference].name -> a.value).toMap
        val im = i.assignments.map(a =>
          a.key.asInstanceOf[AttributeReference].name -> a.value).toMap
        um.keySet == im.keySet && um.forall { case (k, v) => v.semanticEquals(im(k)) }
      case _ => false
    }
    if (unconditional && sameProjection &&
        !spec.matchedActions.exists(_.isInstanceOf[DeleteAction])) {
      val assigns = updOnly.head.assignments.map(a =>
        a.key.asInstanceOf[AttributeReference].name -> a.value).toMap
      val batch = src.select(targetSchema.fields.toSeq.map(f =>
        bridge.column(assigns(f.name)).cast(f.dataType).as(f.name)) :+
        lit(false).as(flag): _*)
      VtDml.runMerge(spark, path, batch, keyNames, flag)
      return Seq.empty
    }

    val kCols = spec.keys.zipWithIndex.map { case ((_, e), i) =>
      bridge.column(e).as(s"__vt_k_$i")
    }
    val withKeys = src.select(col("*") +: kCols: _*)
    val joinKeys = spec.keys.indices.map(i => s"__vt_k_$i")
    // matched/unmatched per source row: one KEYS-ONLY broadcast-shape join
    // — the target side is a single column-pruned scan of the key
    // column(s), the (small) CDC source broadcasts, nothing shuffles and
    // the table is never materialized wide here
    val tgtKeys = VersionedTable.read(spark, path)
      .select(keyNames.zipWithIndex.map { case (k, i) => col(k).as(s"__vt_k_$i") }: _*)
      .distinct()
      .withColumn("__vt_m", lit(true))
    val joined = withKeys.join(tgtKeys, joinKeys.toSeq, "left")
    val matched = coalesce(col("__vt_m"), lit(false))

    def cond(o: Option[Expression], default: Boolean): Column =
      o.map(e => coalesce(bridge.column(e), lit(false))).getOrElse(lit(default))

    // SQL first-match-wins over the matched actions: an earlier action's
    // condition negates into every later one
    var prior: Column = lit(false)
    var delWhen: Column = lit(false)
    var updWhen: Column = lit(false)
    var updAssigns: Option[Map[String, Expression]] = None
    spec.matchedActions.foreach { a =>
      val c = cond(a match {
        case u: UpdateAction => u.condition
        case d: DeleteAction => d.condition
        case other => sys.error(s"unreachable: $other")
      }, default = true) && !prior
      a match {
        case u: UpdateAction =>
          updWhen = c
          updAssigns = Some(u.assignments.map(x =>
            x.key.asInstanceOf[AttributeReference].name -> x.value).toMap)
        case _: DeleteAction => delWhen = c
        case _ => ()
      }
      prior = prior || c
    }
    val insWhen = spec.insertAction.map(i => cond(i.condition, default = true))
      .getOrElse(lit(false))
    val insAssigns = spec.insertAction.map(_.assignments.map(x =>
      x.key.asInstanceOf[AttributeReference].name -> x.value).toMap)

    def fullRow(assigns: Map[String, Expression], del: Boolean): Seq[Column] =
      targetSchema.fields.toSeq.map(f =>
        bridge.column(assigns(f.name)).cast(f.dataType).as(f.name)) :+
        lit(del).as(flag)
    // tombstones only need the keys; remaining columns ride as typed nulls
    val tombstone: Seq[Column] =
      targetSchema.fields.toSeq.map { f =>
        val i = keyNames.indexOf(f.name)
        (if (i >= 0) col(s"__vt_k_$i").cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)
      } :+ lit(true).as(flag)

    val parts = Seq(
      Some(joined.filter(matched && delWhen).select(tombstone: _*)),
      updAssigns.map(a => joined.filter(matched && updWhen).select(fullRow(a, del = false): _*)),
      insAssigns.map(a => joined.filter(!matched && insWhen).select(fullRow(a, del = false): _*))
    ).flatten
    val batch = parts.reduce(_ unionAll _)
    VtDml.runMerge(spark, path, batch, keyNames, flag)
    Seq.empty
  }
}

final case class VtDeleteCommand(path: String, cond: VtExprHolder)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    // rebind the resolved condition BY NAME onto the table's own scan
    // (the DSv2 relation's ExprIds mean nothing to deleteWhere's plan)
    VersionedTable.deleteWhere(spark, path, VtDml.rebindByName(cond.expr))
    Seq.empty
  }
}

/** `UPDATE vt.tbl SET col = expr, ... WHERE cond` →
  * [[VersionedTable.updateWhere]]'s copy-on-write file surgery, or
  * [[VersionedTable.updateWhereDV]]'s zero-rewrite deletion-vector form
  * when `spark.graft.dml.update.mode = dv` (the scattered-update shape:
  * write ∝ rows updated instead of files hit). Assignment values and the
  * condition reference the TARGET row (SQL UPDATE semantics —
  * `SET amount = amount * 2` reads the old value), so both rebind by
  * name onto the table's own scan. */
final case class VtUpdateCommand(path: String, spec: VtAssignHolder)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cond = VtDml.rebindByName(spec.cond)
    val assigns = spec.assigns.map { case (k, v) => k -> VtDml.rebindByName(v) }.toMap
    spark.conf.get("spark.graft.dml.update.mode", "cow") match {
      case "dv" => VersionedTable.updateWhereDV(spark, path, cond, assigns)
      case "cow" => VersionedTable.updateWhere(spark, path, cond, assigns)
      case other => throw new IllegalArgumentException(
        s"spark.graft.dml.update.mode must be cow or dv, got: $other")
    }
    Seq.empty
  }
}

private[sources] object VtDml {
  /** Swap a resolved expression's attribute refs for by-name lookups so
    * it can re-resolve against a different scan of the same table. */
  def rebindByName(e: Expression): Column =
    bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })

  /** Apply a lowered MERGE batch through the mode the session picked:
    * copy-on-write [[VersionedTable.merge]] (default) or the
    * zero-rewrite deletion-vector [[VersionedTable.mergeDV]]
    * (`spark.graft.dml.merge.mode = dv` — write ∝ rows matched, the
    * scattered-key CDC shape). */
  def runMerge(
      spark: SparkSession, path: String,
      batch: org.apache.spark.sql.DataFrame, keys: Seq[String], flag: String): Unit = {
    spark.conf.get("spark.graft.dml.merge.mode", "cow") match {
      case "dv" => VersionedTable.mergeDV(spark, path, batch, keys, deleteFlag = Some(flag))
      case "cow" => VersionedTable.merge(spark, path, batch, keys, deleteFlag = Some(flag))
      case other => throw new IllegalArgumentException(
        s"spark.graft.dml.merge.mode must be cow or dv, got: $other")
    }
    ()
  }
}
