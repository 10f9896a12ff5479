package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.io.VersionedTable

/** Table-maintenance SQL for the versioned table — the ops statements a
  * lakehouse operator expects beside DML (the Delta/Iceberg surface),
  * parsed by a delegating [[ParserInterface]] injected through
  * `SparkSessionExtensions.injectParser`:
  *
  * {{{
  *   DESCRIBE HISTORY vt.events            -- version / operation / parent / files / writers
  *   SHOW TAGS vt.events                   -- release name → pinned version
  *   VACUUM vt.events RETAIN 3 VERSIONS    -- physical retention (tagged versions stay pinned)
  *   VACUUM vt.events RETAIN 3 VERSIONS DRY RUN   -- prediction only, nothing touched
  *   OPTIMIZE vt.events TARGET 100000 ROWS -- small-file compaction (rebases on commit races)
  *   ANALYZE vt.events COMPUTE STATS FOR COLUMNS id, ts
  *                                         -- retrofit file-skipping ranges, metadata-only commit
  *   ANALYZE vt.events COMPUTE BLOOMS FOR COLUMNS id
  *                                         -- retrofit point-lookup bloom sidecars, no rewrite
  *   RESTORE vt.events TO VERSION 3        -- roll the table back (new commit, history kept)
  *   DESCRIBE DETAIL vt.events             -- location / version / files / rows / columns / tags
  * }}}
  *
  * The row-level change feed is a TABLE FUNCTION (registered in
  * GraftExtensions): `SELECT * FROM vt_changes('/path/tbl', 1, 3)` —
  * CDF rows with `_change_type` / `_commit_version`, same contract as
  * [[VersionedTable.changesWithType]].
  *
  * Everything else — including every statement Spark itself understands —
  * falls through to the delegate parser untouched, so the extension can
  * never change the meaning of standard SQL. Table references resolve at
  * RUN time against the session's catalog conf (`vt.name` through the
  * configured warehouse; `vt.`/abs/path`` directly), the same rules as
  * [[VtCatalog]]; a non-graft catalog name refuses rather than guessing.
  */
final class VtSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val describeHistory =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(.+?)\s*;?\s*""".r
  private val showTags =
    """(?is)\s*SHOW\s+TAGS\s+(.+?)\s*;?\s*""".r
  private val vacuum =
    """(?is)\s*VACUUM\s+(.+?)\s+RETAIN\s+(\d+)\s+VERSIONS(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val optimize =
    """(?is)\s*OPTIMIZE\s+(.+?)\s+TARGET\s+(\d+)\s+ROWS(\s+ZORDER)?\s*;?\s*""".r
  private val analyze =
    """(?is)\s*ANALYZE\s+(.+?)\s+COMPUTE\s+STATS\s+FOR\s+COLUMNS\s+([\w.,\s`-]+?)\s*;?\s*""".r
  private val analyzeBlooms =
    """(?is)\s*ANALYZE\s+(.+?)\s+COMPUTE\s+BLOOMS\s+FOR\s+COLUMNS\s+([\w.,\s`-]+?)\s*;?\s*""".r
  private val restore =
    """(?is)\s*RESTORE\s+(.+?)\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val describeDetail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+(.+?)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case describeHistory(ident) =>
      VtHistoryCommand(parts(ident))
    case showTags(ident) =>
      VtShowTagsCommand(parts(ident))
    case vacuum(ident, keep, dry) =>
      VtVacuumCommand(parts(ident), keep.toInt, dryRun = dry != null)
    case optimize(ident, target, zorder) =>
      VtOptimizeCommand(parts(ident), target.toLong, zOrder = zorder != null)
    case analyze(ident, cols) =>
      VtAnalyzeCommand(parts(ident),
        cols.split(",").map(c => c.trim.stripPrefix("`").stripSuffix("`")).toSeq)
    case analyzeBlooms(ident, cols) =>
      VtAnalyzeBloomsCommand(parts(ident),
        cols.split(",").map(c => c.trim.stripPrefix("`").stripSuffix("`")).toSeq)
    case restore(ident, version) =>
      VtRestoreCommand(parts(ident), version.toLong)
    case describeDetail(ident) =>
      VtDescribeDetailCommand(parts(ident))
    case _ => delegate.parsePlan(sqlText)
  }

  private def parts(ident: String): Seq[String] =
    delegate.parseMultipartIdentifier(ident.trim)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Shared run-time resolution of a maintenance statement's table
  * reference: `cat.name` → `<warehouse>/name` when `cat` is a registered
  * [[VtCatalog]]; `cat.`/abs/path`` → the path; a bare `/abs/path`
  * identifier → itself. */
private[sources] object VtSqlOps {
  def resolvePath(spark: SparkSession, parts: Seq[String]): String = {
    require(parts.nonEmpty, "empty table reference")
    if (parts.length == 1 && parts.head.startsWith("/")) return parts.head
    val cat = parts.head
    val impl = spark.conf.getOption(s"spark.sql.catalog.$cat")
    require(impl.contains(classOf[VtCatalog].getName),
      s"'$cat' is not a graft versioned-table catalog (statement supported only for vt tables)")
    val rest = parts.tail
    if (rest.length == 1 && rest.head.startsWith("/")) rest.head
    else {
      val wh = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse").getOrElse(
        throw new IllegalArgumentException(
          s"catalog '$cat' has no warehouse configured — set " +
            s"spark.sql.catalog.$cat.warehouse or use a /path identifier"))
      (wh +: rest).mkString("/")
    }
  }

  def attr(name: String, dt: DataType): AttributeReference =
    AttributeReference(name, dt, nullable = false)()
}

final case class VtHistoryCommand(tableParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("version", LongType), VtSqlOps.attr("operation", StringType),
    VtSqlOps.attr("parent", LongType), VtSqlOps.attr("n_files", IntegerType),
    VtSqlOps.attr("writers", StringType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    VersionedTable.history(spark, path).map(v =>
      Row(v.version, v.operation, v.parent, v.nFiles, v.writers.mkString(",")))
  }
}

final case class VtShowTagsCommand(tableParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("tag", StringType), VtSqlOps.attr("version", LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    VersionedTable.tags(spark, path).toSeq.sortBy(_._1).map {
      case (t, v) => Row(t, v)
    }
  }
}

final case class VtVacuumCommand(tableParts: Seq[String], keepLast: Int, dryRun: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("versions_removed", IntegerType),
    VtSqlOps.attr("files_removed", IntegerType),
    VtSqlOps.attr("bytes_removed", LongType),
    VtSqlOps.attr("dry_run", BooleanType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    // bytes come from the dry-run listing either way; the real vacuum
    // then deletes exactly that prediction (VersionedTableSpec pins the
    // prediction == removal contract).
    val (versions, files, bytes) = VersionedTable.vacuumDryRun(spark, path, keepLast)
    if (!dryRun) VersionedTable.vacuum(spark, path, keepLast)
    Seq(Row(versions.size, files.size, bytes, dryRun))
  }
}

final case class VtAnalyzeCommand(tableParts: Seq[String], cols: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("new_version", LongType),
    VtSqlOps.attr("columns", StringType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val v = VersionedTable.analyzeStats(spark, path, cols)
    Seq(Row(v, cols.mkString(",")))
  }
}

final case class VtAnalyzeBloomsCommand(tableParts: Seq[String], cols: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("new_version", LongType),
    VtSqlOps.attr("columns", StringType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val v = VersionedTable.analyzeBlooms(spark, path, cols)
    Seq(Row(v, cols.mkString(",")))
  }
}

final case class VtRestoreCommand(tableParts: Seq[String], version: Long)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("new_version", LongType),
    VtSqlOps.attr("restored_version", LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val v = VersionedTable.restore(spark, path, version)
    Seq(Row(v, version))
  }
}

final case class VtDescribeDetailCommand(tableParts: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("location", StringType),
    VtSqlOps.attr("current_version", LongType),
    VtSqlOps.attr("n_versions", IntegerType),
    VtSqlOps.attr("n_files", IntegerType),
    VtSqlOps.attr("n_rows", LongType),
    VtSqlOps.attr("n_columns", IntegerType),
    VtSqlOps.attr("n_tags", IntegerType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val hist = VersionedTable.history(spark, path)
    val head = hist.last
    // n_rows rides the manifest row counts when recorded (append/compact/
    // analyze paths record them); tables written by stats-less paths fall
    // back to one honest count scan — same contract as countRows itself
    Seq(Row(
      path, head.version, hist.size, head.nFiles,
      VersionedTable.countRows(spark, path),
      VersionedTable.tableSchema(spark, path, None).fields.length,
      VersionedTable.tags(spark, path).size))
  }
}

final case class VtOptimizeCommand(tableParts: Seq[String], targetRows: Long, zOrder: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("new_version", LongType),
    VtSqlOps.attr("files_rewritten", LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val (v, rewritten) = VersionedTable.compact(spark, path, targetRows, zOrder = zOrder)
    Seq(Row(v, rewritten))
  }
}
