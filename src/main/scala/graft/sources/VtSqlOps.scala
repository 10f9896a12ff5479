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
  *   VACUUM STAGING vt.events OLDER THAN 24 HOURS -- reclaim abandoned WAP stages
  *   OPTIMIZE vt.events TARGET 100000 ROWS -- small-file compaction (rebases on commit races)
  *   OPTIMIZE vt.events TARGET 100000 ROWS WHERE id BETWEEN 0 AND 999
  *                                         -- scoped: compact only files whose recorded
  *                                            range intersects (the hot-ingest-range shape)
  *   OPTIMIZE vt.events REBUCKET           -- restore a dropped bucket claim by rewriting
  *                                            only the unclaimed tail (claimed files carry)
  *   ANALYZE vt.events COMPUTE STATS FOR COLUMNS id, ts
  *                                         -- retrofit file-skipping ranges, metadata-only commit
  *   ANALYZE vt.events COMPUTE BLOOMS FOR COLUMNS id
  *                                         -- retrofit point-lookup bloom sidecars, no rewrite
  *   RESTORE vt.events TO VERSION 3        -- roll the table back (new commit, history kept)
  *   DESCRIBE DETAIL vt.events             -- location / version / files / rows / columns / tags
  *   CREATE MATERIALIZED VIEW vt.daily AS SELECT k, SUM(v) FROM vt.fact GROUP BY k
  *   REFRESH MATERIALIZED VIEW vt.daily    -- CDF refresh + re-register (fresh sessions too)
  *   DROP MATERIALIZED VIEW vt.daily       -- unregister + delete the state
  *   SHOW MATERIALIZED VIEWS IN vt         -- discover _mv.json definitions + registration
  *   REFRESH MATERIALIZED VIEWS IN vt      -- the cron statement: refresh + re-register all
  *   SHOW STAGES IN vt.events              -- WAP observability: pending/published stages
  *   PUBLISH STAGE 'staging-<id>' IN vt.events  -- adopt a pending stage (crash recovery)
  *   ABORT STAGE 'staging-<id>' IN vt.events    -- drop a pending stage (audit said no)
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
  private val vacuumStaging =
    """(?is)\s*VACUUM\s+STAGING\s+(.+?)\s+OLDER\s+THAN\s+(\d+)\s+HOURS\s*;?\s*""".r
  private val vacuum =
    """(?is)\s*VACUUM\s+(.+?)\s+RETAIN\s+(\d+)\s+VERSIONS(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val optimize =
    ("""(?is)\s*OPTIMIZE\s+(.+?)\s+TARGET\s+(\d+)\s+ROWS(\s+ZORDER)?""" +
      """(?:\s+WHERE\s+([\w.-]+)\s+BETWEEN\s+(-?\d+)\s+AND\s+(-?\d+))?\s*;?\s*""").r
  private val rebucketIntoStmt =
    """(?is)\s*OPTIMIZE\s+(.+?)\s+REBUCKET\s+INTO\s+(\d+)\s+BUCKETS\s*;?\s*""".r
  private val rebucketStmt =
    """(?is)\s*OPTIMIZE\s+(.+?)\s+REBUCKET\s*;?\s*""".r
  private val analyze =
    """(?is)\s*ANALYZE\s+(.+?)\s+COMPUTE\s+STATS\s+FOR\s+COLUMNS\s+([\w.,\s`-]+?)\s*;?\s*""".r
  private val analyzeBlooms =
    """(?is)\s*ANALYZE\s+(.+?)\s+COMPUTE\s+BLOOMS\s+FOR\s+COLUMNS\s+([\w.,\s`-]+?)\s*;?\s*""".r
  private val restore =
    """(?is)\s*RESTORE\s+(.+?)\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val describeDetail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+(.+?)\s*;?\s*""".r
  private val describeBuckets =
    """(?is)\s*DESCRIBE\s+BUCKETS\s+(.+?)\s*;?\s*""".r
  private val createMv =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\S+)\s+AS\s+(SELECT\s.+?)\s*;?\s*""".r
  private val refreshAllMvs =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEWS\s+IN\s+(\S+)\s*;?\s*""".r
  private val refreshMv =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\S+)\s*;?\s*""".r
  private val dropMv =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(\S+)\s*;?\s*""".r
  private val showMvs =
    """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s+IN\s+(\S+)\s*;?\s*""".r
  private val showStages =
    """(?is)\s*SHOW\s+STAGES\s+IN\s+(\S+)\s*;?\s*""".r
  private val publishStage =
    """(?is)\s*PUBLISH\s+STAGE\s+'([\w-]+)'\s+IN\s+(\S+)\s*;?\s*""".r
  private val abortStage =
    """(?is)\s*ABORT\s+STAGE\s+'([\w-]+)'\s+IN\s+(\S+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case describeHistory(ident) =>
      VtHistoryCommand(parts(ident))
    case showTags(ident) =>
      VtShowTagsCommand(parts(ident))
    case vacuumStaging(ident, hours) =>
      VtVacuumStagingCommand(parts(ident), hours.toInt)
    case vacuum(ident, keep, dry) =>
      VtVacuumCommand(parts(ident), keep.toInt, dryRun = dry != null)
    case rebucketIntoStmt(ident, m) =>
      VtRebucketIntoCommand(parts(ident), m.toInt)
    case rebucketStmt(ident) =>
      VtRebucketCommand(parts(ident))
    case optimize(ident, target, zorder, scopeCol, lo, hi) =>
      VtOptimizeCommand(parts(ident), target.toLong, zOrder = zorder != null,
        scope = Option(scopeCol).map(c => (c, lo.toLong, hi.toLong)))
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
    case describeBuckets(ident) =>
      VtDescribeBucketsCommand(parts(ident))
    case createMv(ident, select) =>
      val spec = MvSql.extract(delegate, select)
      VtCreateMvCommand(parts(ident), spec)
    case refreshAllMvs(ident) =>
      VtRefreshAllMvsCommand(parts(ident))
    case refreshMv(ident) =>
      VtRefreshMvCommand(parts(ident))
    case dropMv(ident) =>
      VtDropMvCommand(parts(ident))
    case showMvs(ident) =>
      VtShowMvsCommand(parts(ident))
    case showStages(ident) =>
      VtShowStagesCommand(parts(ident))
    case publishStage(id, ident) =>
      VtPublishStageCommand(parts(ident), id)
    case abortStage(id, ident) =>
      VtAbortStageCommand(parts(ident), id)
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
    // a real vacuum reports ITS OWN removals (one plan drives delete and
    // report); only the dry run uses the pure-listing prediction.
    val (versions, files, bytes) =
      if (dryRun) VersionedTable.vacuumDryRun(spark, path, keepLast)
      else VersionedTable.vacuumWithStats(spark, path, keepLast)
    Seq(Row(versions.size, files.size, bytes, dryRun))
  }
}

/** `VACUUM STAGING vt.t OLDER THAN 24 HOURS`: reclaim ABANDONED
  * write-audit-publish stages (regular VACUUM deliberately skips
  * unreferenced `staging-*` dirs — a stage mid-audit must survive). */
final case class VtVacuumStagingCommand(tableParts: Seq[String], olderThanHours: Int)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("stages_removed", IntegerType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val cutoff = System.currentTimeMillis() - olderThanHours * 3600L * 1000L
    Seq(Row(VersionedTable.vacuumStaging(spark, path, cutoff)))
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
    VtSqlOps.attr("n_tags", IntegerType),
    VtSqlOps.attr("n_staged", IntegerType),
    VtSqlOps.attr("bucketing", StringType),
    VtSqlOps.attr("stats_columns", StringType),
    VtSqlOps.attr("planner_pruning", StringType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val hist = VersionedTable.history(spark, path)
    val head = hist.last
    // both pruning channels, human-readable: "id:long, doc_id:string"
    val (longCols, typedCols) = VersionedTable.statsColumns(spark, path)
    val statsDesc = (longCols.sorted.map(c => s"$c:long") ++
      typedCols.toSeq.sorted.map { case (c, t) => s"$c:$t" }) match {
      case Nil => "none"
      case xs => xs.mkString(", ")
    }
    // what an ORDINARY Catalyst predicate prunes per column, operator-
    // readable: every stats column prunes ranges in its recorded domain
    // (typed channel wins for columns recorded in both — a timestamp
    // prunes micro-exactly, a double fractionally), and bloom-covered
    // columns add point-probe pruning. This is the planner-path truth:
    // readWhere*/readKeys* prune the same columns programmatically.
    val bloomCols = VersionedTable.bloomColumns(spark, path).toSet
    val plannerDesc = {
      val domains = longCols.map(c => c -> "long").toMap ++ typedCols
      (domains.toSeq.sorted.map { case (c, t) =>
        s"$c:ranges($t)" + (if (bloomCols.contains(c)) "+bloom" else "")
      } ++ (bloomCols -- domains.keySet).toSeq.sorted.map(c => s"$c:bloom")) match {
        case Nil => "none"
        case xs => xs.mkString(", ")
      }
    }
    // n_rows rides the manifest row counts when recorded (append/compact/
    // analyze paths record them); tables written by stats-less paths fall
    // back to one honest count scan — same contract as countRows itself
    Seq(Row(
      path, head.version, hist.size, head.nFiles,
      VersionedTable.countRows(spark, path),
      VersionedTable.tableSchema(spark, path, None).fields.length,
      VersionedTable.tags(spark, path).size,
      // pending (unpublished) WAP stages — the "is an audit stuck" signal
      VersionedTable.stagedPending(spark, path),
      // the join-layout claim ("key:n"), or the explicit absence marker
      VersionedTable.bucketing(spark, path)
        .map { case (k, n) => s"$k:$n" }.getOrElse("unbucketed"),
      statsDesc, plannerDesc))
  }
}

/** `DESCRIBE BUCKETS <tbl>`: the per-bucket row distribution of a
  * CLAIMED table straight from manifest metadata
  * ([[graft.io.VersionedTable.bucketSkew]] — zero data reads), one row
  * per declared bucket plus the skew summary every row repeats. A hot
  * key concentrates in one bucket (hashing cannot split equal values):
  * `skew_ratio` far above ~2 says the layout is fighting the data —
  * re-bucket on a compound key or fall back to salted joins. Empty
  * declared buckets report zero rows (they matter: the join still plans
  * n partitions). Refuses an unbucketed table. */
final case class VtDescribeBucketsCommand(tableParts: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("bucket", IntegerType),
    VtSqlOps.attr("n_rows", LongType),
    VtSqlOps.attr("bucket_key", StringType),
    VtSqlOps.attr("n_buckets", IntegerType),
    VtSqlOps.attr("skew_ratio", org.apache.spark.sql.types.DoubleType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val (key, n) = VersionedTable.bucketing(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"table at $path carries no bucketing claim — DESCRIBE DETAIL shows layout"))
    val (perBucket, ratio) = VersionedTable.bucketSkew(spark, path)
    (0 until n).map(b => Row(b, perBucket.getOrElse(b, 0L), key, n, ratio))
  }
}

/** `OPTIMIZE <tbl> REBUCKET`: incremental bucket-claim recovery
  * ([[graft.io.VersionedTable.rebucket]]) — after a plain append
  * dropped the claim, restore the most recent retained claimed layout
  * by rewriting ONLY the unclaimed tail; claimed-era files carry by
  * reference. Cost ∝ the tail, not table size. Refuses when no retained
  * version carries a claim or a key column's type changed since (the
  * old murmur3 layout cannot be honestly restored — rewrite with a
  * fresh bucketed commit instead). One row: the restored layout and the
  * carried/rewritten file split. */
final case class VtRebucketCommand(tableParts: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("version", LongType),
    VtSqlOps.attr("bucket_key", StringType),
    VtSqlOps.attr("n_buckets", IntegerType),
    VtSqlOps.attr("files_carried", IntegerType),
    VtSqlOps.attr("files_rewritten", IntegerType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val r = VersionedTable.rebucket(spark, path)
    Seq(Row(r.version, r.key, r.nBuckets, r.filesCarried, r.filesRewritten))
  }
}

/** `OPTIMIZE <tbl> REBUCKET INTO <m> BUCKETS`: bucket-count evolution
  * ([[graft.io.VersionedTable.rebucketInto]]) — power-of-two growth
  * splits each old bucket LOCALLY into its children (murmur3 mod 2n
  * refines mod n: no shuffle, no cross-bucket movement); any other
  * target runs one full bucketed rewrite and the `local` column says
  * which path ran. One row: the new layout, the path, files written. */
final case class VtRebucketIntoCommand(tableParts: Seq[String], newN: Int)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("version", LongType),
    VtSqlOps.attr("bucket_key", StringType),
    VtSqlOps.attr("n_buckets", IntegerType),
    VtSqlOps.attr("local", BooleanType),
    VtSqlOps.attr("files_written", IntegerType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val r = VersionedTable.rebucketInto(spark, path, newN)
    Seq(Row(r.version, r.key, r.nBuckets, r.local, r.filesWritten))
  }
}

/** The statement-level materialized-view surface — the one catalog
  * statement that was Scala-only (`MvRewrite.materialize*` /
  * `registerRollup`). Grammar: the canonical fact rollup, or the classic
  * dim-joined STAR rollup (the rewriter serves richer queries AGAINST
  * either — filters, partial agg sets, other dim groupings):
  *
  * {{{
  *   CREATE MATERIALIZED VIEW vt.daily AS
  *     SELECT k1, k2, SUM(v) FROM vt.fact GROUP BY k1, k2
  *   CREATE MATERIALIZED VIEW vt.by_region AS        -- star: lowered to the
  *     SELECT d_region, SUM(v) FROM vt.fact          -- fact rollup keyed by
  *     JOIN vt.dim ON fact_fk = dim_pk               -- the fact-side join
  *     GROUP BY d_region                             -- keys (see lowerStar)
  *   REFRESH MATERIALIZED VIEW vt.daily   -- vt-fact views: CDF-driven touched-group refresh
  *   DROP MATERIALIZED VIEW vt.daily      -- unregister + delete the state
  * }}}
  *
  * Fact forms: `parquet.`/abs/path`` (one-shot state via
  * [[graft.plans.MvRewrite.materialize]]) or a vt reference (MAINTAINED:
  * state bootstrapped through
  * [[graft.ops.IncrementalView.refreshRecompute]] and registered via
  * [[graft.plans.MvRewrite.registerRollup]], so REFRESH cost scales with
  * the change volume, never the fact). The definition is persisted at
  * `<view>/_mv.json`, so REFRESH — and re-registration in a NEW session
  * — need only the view name (a star definition persists its LOWERED
  * fact-rollup spec, so refresh/show/drop are identical for both forms).
  * Aggregates may use COUNT/SUM/MIN/MAX/AVG over at most ONE value
  * column (the decomposable state vector); WHERE/ordinals/outer or
  * non-equi joins in the DEFINITION refuse with a pointed message
  * rather than registering a view the rewriter would serve wrongly. */
private[sources] object MvSql {

  final case class Spec(factParts: Seq[String], groupCols: Seq[String], valueCol: String)

  /** A star definition: `SELECT keys, aggs FROM fact JOIN dim ON ... GROUP
    * BY keys`. The FROM clause's LEFT-MOST relation is the fact; dims hang
    * off it (or off each other — snowflake) through INNER equi-joins. The
    * lowering does NOT materialize the join: the state is the FACT rolled
    * up by its join keys (+ any fact-side group keys), and
    * [[graft.plans.MvRewrite]]'s star path serves the dim-grouped queries
    * from it at query time — same economics as the Scala registration
    * (oracle q167). `condSides` carries each equi-condition's two
    * attribute name-parts; fact-vs-dim attribution needs schemas, so it
    * happens in [[VtCreateMvCommand.run]]. */
  final case class StarSpec(
      factParts: Seq[String],
      condSides: Seq[(Seq[String], Seq[String])],
      groupCols: Seq[String],
      valueCol: String)

  private val AllowedAggs = Set("count", "sum", "min", "max", "avg")

  def extract(parser: ParserInterface, select: String): Either[Spec, StarSpec] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, SubqueryAlias}
    import org.apache.spark.sql.catalyst.plans.Inner
    def refuse(msg: String): Nothing = throw new IllegalArgumentException(
      s"CREATE MATERIALIZED VIEW: $msg — the definition must be " +
        "`SELECT <keys>, <COUNT/SUM/MIN/MAX/AVG over one column> FROM <fact> " +
        "[JOIN <dim> ON <fact_key> = <dim_key> ...] GROUP BY <keys>` " +
        "(filters and richer aggregates belong in the QUERIES the view serves, " +
        "not in its definition)")
    // a FROM-clause join tree: left-most relation is the fact, every join
    // INNER with a conjunction of column equi-predicates
    def splitConj(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        splitConj(l) ++ splitConj(r)
      case other => Seq(other)
    }
    def walkJoins(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : (Seq[String], Seq[(Seq[String], Seq[String])]) = p match {
      case r: UnresolvedRelation => (r.multipartIdentifier, Seq.empty)
      case SubqueryAlias(_, c) => walkJoins(c)
      case Join(l, r, Inner, cond, _) =>
        val (fact, lConds) = walkJoins(l)
        r match {
          case _: UnresolvedRelation | SubqueryAlias(_, _: UnresolvedRelation) => ()
          case _ => refuse("each JOIN's right side must be a dim table (no subqueries)")
        }
        val conds = splitConj(cond.getOrElse(
          refuse("star JOINs need an ON clause of column equalities"))).map {
          case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
            (a.nameParts, b.nameParts)
          case other => refuse(s"star JOIN conditions must be column equalities, got: ${other.sql}")
        }
        (fact, lConds ++ conds)
      case Join(_, _, jt, _, _) =>
        refuse(s"star definitions take INNER joins only, got: ${jt.sql}")
      case _ => refuse("the FROM clause must be a fact table, optionally INNER-joined to dims")
    }
    parser.parsePlan(select) match {
      case Aggregate(grouping, aggList, child, _) =>
        val (factParts, condSides) = child match {
          case r: UnresolvedRelation => (r.multipartIdentifier, Seq.empty)
          case SubqueryAlias(_, r: UnresolvedRelation) => (r.multipartIdentifier, Seq.empty)
          case j: Join => walkJoins(j)
          case _ => refuse("the FROM clause must be a fact table, optionally INNER-joined to dims (no WHERE/subquery)")
        }
        val groupCols = grouping.map {
          case a: UnresolvedAttribute => a.nameParts.last
          case other => refuse(s"GROUP BY must list column names, got: ${other.sql}")
        }
        def strip(e: org.apache.spark.sql.catalyst.expressions.Expression)
            : org.apache.spark.sql.catalyst.expressions.Expression = e match {
          case Alias(c, _) => strip(c)
          case UnresolvedAlias(c, _) => strip(c)
          case c => c
        }
        val valueCols = aggList.map(strip).flatMap {
          case a: UnresolvedAttribute =>
            if (!groupCols.contains(a.nameParts.last))
              refuse(s"non-aggregated column ${a.name}")
            Seq.empty
          case e =>
            val fn = e match {
              case f: UnresolvedFunction => f
              case other => refuse(s"unsupported select expression: ${other.sql}")
            }
            val name = fn.nameParts.last.toLowerCase(java.util.Locale.ROOT)
            if (!AllowedAggs.contains(name))
              refuse(s"aggregate $name is not decomposable over the state vector")
            if (fn.isDistinct) refuse("DISTINCT aggregates are not decomposable")
            fn.arguments.flatMap(_.collect {
              case a: UnresolvedAttribute => a.nameParts.last
            })
        }.distinct
        if (valueCols.exists(groupCols.contains))
          refuse("aggregating a GROUP BY key")
        if (valueCols.size > 1)
          refuse(s"aggregates reference ${valueCols.size} columns (${valueCols.mkString(", ")}); " +
            "one state vector covers one value column — create one view per column")
        val valueCol = valueCols.headOption.getOrElse("")
        if (condSides.isEmpty) Left(Spec(factParts, groupCols, valueCol))
        else Right(StarSpec(factParts, condSides, groupCols, valueCol))
      case _ => refuse("the definition must be a GROUP BY aggregate")
    }
  }

  private def specFile(viewPath: String) = new org.apache.hadoop.fs.Path(s"$viewPath/_mv.json")

  def writeSpec(spark: SparkSession, viewPath: String, factRef: String, spec: Spec,
      maintained: Boolean): Unit = {
    val f = specFile(viewPath).getFileSystem(spark.sessionState.newHadoopConf())
    val out = f.create(specFile(viewPath), true)
    try out.write(
      (s"""{"fact":"$factRef","group_cols":[${spec.groupCols.map(c => s""""$c"""").mkString(",")}],""" +
        s""""value_col":"${spec.valueCol}","maintained":$maintained}""").getBytes("UTF-8"))
    finally out.close()
  }

  /** (factRef, groupCols, valueCol, maintained) from `<view>/_mv.json`. */
  def readSpec(spark: SparkSession, viewPath: String): (String, Seq[String], String, Boolean) = {
    val f = specFile(viewPath).getFileSystem(spark.sessionState.newHadoopConf())
    require(f.exists(specFile(viewPath)),
      s"no materialized view at $viewPath (missing _mv.json — was it created by " +
        "CREATE MATERIALIZED VIEW?)")
    val in = f.open(specFile(viewPath))
    val text =
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        bytes.toString("UTF-8")
      } finally in.close()
    def field(k: String) = (s""""$k":"([^"]*)"""").r.findFirstMatchIn(text)
      .getOrElse(sys.error(s"malformed _mv.json at $viewPath")).group(1)
    val groups = """"group_cols":\[([^\]]*)\]""".r.findFirstMatchIn(text)
      .getOrElse(sys.error(s"malformed _mv.json at $viewPath")).group(1)
      .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    (field("fact"), groups, field("value_col"), text.contains(""""maintained":true"""))
  }

  def stateAggsFor(valueCol: String): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{count, lit}
    if (valueCol.isEmpty) Seq(count(lit(1)).as("n_rows"))
    else graft.plans.MvRewrite.stateAggs(valueCol)
  }
}

final case class VtCreateMvCommand(
    viewParts: Seq[String], definition: Either[MvSql.Spec, MvSql.StarSpec])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("view", StringType), VtSqlOps.attr("fact", StringType),
    VtSqlOps.attr("group_cols", StringType), VtSqlOps.attr("value_col", StringType),
    VtSqlOps.attr("maintained", BooleanType))

  /** Lower a star definition to the fact-rollup state that serves it: the
    * state's keys are the FACT-side join keys plus any fact-side GROUP BY
    * columns; dim-side group keys ride the join at query time through
    * [[graft.plans.MvRewrite]]'s star path. Attribution is by fact-schema
    * membership (names are TPC-H-style unambiguous; a condition whose two
    * sides BOTH live in the fact schema refuses as ambiguous). A column
    * that exists in both fact and a dim only over-attributes: an extra
    * state key makes the state finer, never wrong. */
  private def lowerStar(spark: SparkSession, star: MvSql.StarSpec): MvSql.Spec = {
    def refuse(msg: String): Nothing = throw new IllegalArgumentException(
      s"CREATE MATERIALIZED VIEW (star): $msg")
    val factSchema: Set[String] = (star.factParts match {
      case Seq(fmt, path) if fmt.equalsIgnoreCase("parquet") =>
        spark.read.parquet(path).schema
      case _ =>
        VersionedTable.tableSchema(
          spark, VtSqlOps.resolvePath(spark, star.factParts), None)
    }).fieldNames.toSet
    val joinKeys = star.condSides.flatMap { case (l, r) =>
      (factSchema.contains(l.last), factSchema.contains(r.last)) match {
        case (true, true) => refuse(
          s"both sides of ${l.mkString(".")} = ${r.mkString(".")} are fact columns — " +
            "a star join links the fact to a dim")
        case (true, false) => Some(l.last)
        case (false, true) => Some(r.last)
        case (false, false) => None // dim-dim link (snowflake) — no state key
      }
    }
    if (joinKeys.isEmpty)
      refuse("no join condition links the fact to a dim (every equality is dim-dim)")
    if (star.valueCol.nonEmpty && !factSchema.contains(star.valueCol))
      refuse(s"aggregated column ${star.valueCol} is not a fact column — " +
        "dim-column aggregates belong in the queries the view serves")
    val stateKeys = (joinKeys ++ star.groupCols.filter(factSchema.contains)).distinct
    MvSql.Spec(star.factParts, stateKeys, star.valueCol)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val viewPath = VtSqlOps.resolvePath(spark, viewParts)
    val spec = definition.fold(identity, lowerStar(spark, _))
    val (factRef, maintained) = spec.factParts match {
      case Seq(fmt, path) if fmt.equalsIgnoreCase("parquet") =>
        // plain parquet fact: one-shot state + registration
        graft.plans.MvRewrite.materialize(
          spark, path, spec.groupCols, spec.valueCol, viewPath)
        (path, false)
      case _ =>
        // versioned fact: bootstrap the state table through the CDF
        // refresher, then register — REFRESH keeps it current
        val factPath = VtSqlOps.resolvePath(spark, spec.factParts)
        graft.ops.IncrementalView.refreshRecompute(
          spark, factPath, viewPath, "sql-mv", spec.groupCols,
          MvSql.stateAggsFor(spec.valueCol))
        graft.plans.MvRewrite.registerRollup(
          spark, factPath, spec.groupCols, spec.valueCol, viewPath)
        (factPath, true)
    }
    MvSql.writeSpec(spark, viewPath, factRef, spec, maintained)
    Seq(Row(viewPath, factRef, spec.groupCols.mkString(","), spec.valueCol, maintained))
  }
}

final case class VtRefreshMvCommand(viewParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("view", StringType), VtSqlOps.attr("refreshed", BooleanType))
  override def run(spark: SparkSession): Seq[Row] = {
    val viewPath = VtSqlOps.resolvePath(spark, viewParts)
    val (factRef, groupCols, valueCol, maintained) = MvSql.readSpec(spark, viewPath)
    require(maintained,
      s"materialized view at $viewPath is a one-shot parquet view — re-create it " +
        "(REFRESH serves vt-fact maintained views)")
    val refreshed = graft.ops.IncrementalView.refreshRecompute(
      spark, factRef, viewPath, "sql-mv", groupCols, MvSql.stateAggsFor(valueCol))
    // re-register: also heals a NEW session where the registry is empty
    graft.plans.MvRewrite.registerRollup(spark, factRef, groupCols, valueCol, viewPath)
    Seq(Row(viewPath, refreshed.isDefined))
  }
}

/** `REFRESH MATERIALIZED VIEWS IN <catalog|/dir>`: the cron statement —
  * every MAINTAINED `_mv.json` view under the warehouse refreshes
  * through the CDF and re-registers (healing a fresh session in one
  * statement); one-shot parquet views are listed as skipped. */
final case class VtRefreshAllMvsCommand(dirParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("view", StringType), VtSqlOps.attr("maintained", BooleanType),
    VtSqlOps.attr("refreshed", BooleanType))
  override def run(spark: SparkSession): Seq[Row] = {
    VtShowMvsCommand(dirParts).run(spark).map { r =>
      val viewPath = r.getString(0)
      val maintained = r.getBoolean(4)
      if (!maintained) Row(viewPath, false, false)
      else {
        val (factRef, groupCols, valueCol, _) = MvSql.readSpec(spark, viewPath)
        val refreshed = graft.ops.IncrementalView.refreshRecompute(
          spark, factRef, viewPath, "sql-mv", groupCols, MvSql.stateAggsFor(valueCol))
        graft.plans.MvRewrite.registerRollup(spark, factRef, groupCols, valueCol, viewPath)
        Row(viewPath, true, refreshed.isDefined)
      }
    }
  }
}

final case class VtDropMvCommand(viewParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("view", StringType), VtSqlOps.attr("dropped", BooleanType))
  override def run(spark: SparkSession): Seq[Row] = {
    val viewPath = VtSqlOps.resolvePath(spark, viewParts)
    val p = new org.apache.hadoop.fs.Path(viewPath)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    // DROP recursively deletes — so the target must PROVE it is a
    // materialized view before anything is removed: either the persisted
    // `_mv.json` spec exists, or the path is registered with this
    // session's rewriter (Scala-registered views have no spec file).
    // Without this, `DROP MATERIALIZED VIEW vt.events` against a plain
    // versioned table would destroy the whole table.
    val isMv = f.exists(new org.apache.hadoop.fs.Path(s"$viewPath/_mv.json")) ||
      graft.plans.MvRewrite.registeredIds(viewPath)
    require(!f.exists(p) || isMv,
      s"$viewPath is not a materialized view (no _mv.json and not registered with " +
        "the rewriter) — refusing to delete; use the table-maintenance surface to " +
        "drop plain tables")
    val existed = graft.plans.MvRewrite.unregister(viewPath)
    val deleted = isMv && f.exists(p) && f.delete(p, true)
    Seq(Row(viewPath, existed || deleted))
  }
}

/** `SHOW MATERIALIZED VIEWS IN <catalog-or-dir>`: every `_mv.json`
  * definition one directory level under the warehouse (or an explicit
  * path), with whether it is registered with the CURRENT session's
  * rewriter — the discovery statement that makes `REFRESH MATERIALIZED
  * VIEW` usable from a fresh session without remembering view names. */
final case class VtShowMvsCommand(dirParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("view", StringType), VtSqlOps.attr("fact", StringType),
    VtSqlOps.attr("group_cols", StringType), VtSqlOps.attr("value_col", StringType),
    VtSqlOps.attr("maintained", BooleanType), VtSqlOps.attr("registered", BooleanType))
  override def run(spark: SparkSession): Seq[Row] = {
    val dir =
      if (dirParts.length == 1 && dirParts.head.startsWith("/")) dirParts.head
      else {
        val cat = dirParts.head
        require(dirParts.length == 1, s"expected a catalog name or /path, got: $dirParts")
        val impl = spark.conf.getOption(s"spark.sql.catalog.$cat")
        require(impl.contains(classOf[VtCatalog].getName),
          s"'$cat' is not a graft versioned-table catalog")
        spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse").getOrElse(
          throw new IllegalArgumentException(
            s"catalog '$cat' has no warehouse configured"))
      }
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) return Seq.empty
    val registered = graft.plans.MvRewrite.registeredIds
    f.listStatus(p).filter(_.isDirectory).toSeq.flatMap { d =>
      val vp = d.getPath.toUri.getPath
      if (!f.exists(new org.apache.hadoop.fs.Path(s"$vp/_mv.json"))) None
      else {
        val (fact, groups, valueCol, maintained) = MvSql.readSpec(spark, vp)
        Some(Row(vp, fact, groups.mkString(","), valueCol, maintained, registered(vp)))
      }
    }.sortBy(_.getString(0))
  }
}

/** `SHOW STAGES IN <tbl>`: every WAP staging dir with its adoption
  * status — the "which audits are stuck / which writers died mid-WAP"
  * console. `pending` stages are candidates for `PUBLISH STAGE` (the
  * audit passed but the writer crashed before publish) or
  * `ABORT STAGE` / `VACUUM STAGING` (it did not). */
final case class VtShowStagesCommand(tableParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("stage_id", StringType), VtSqlOps.attr("files", IntegerType),
    VtSqlOps.attr("bytes", LongType), VtSqlOps.attr("status", StringType),
    VtSqlOps.attr("modified", LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    VersionedTable.stages(spark, path).map { s =>
      val status =
        if (!s.published) "pending"
        else if (s.referenced) "published"
        else "published-expired" // vacuum's to reclaim
      Row(s.id, s.files, s.bytes, status, s.modifiedMs)
    }
  }
}

/** `PUBLISH STAGE '<id>' IN <tbl>`: adopt a pending stage from its id
  * alone — the crash-recovery statement (writer died between a passing
  * audit and publish; the handle object is gone, the dir is not).
  * Metadata-only, same CHECK re-enforcement and double-publish refusal
  * as [[graft.io.VersionedTable.publishStaged]]. */
final case class VtPublishStageCommand(tableParts: Seq[String], stageId: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("stage_id", StringType), VtSqlOps.attr("new_version", LongType),
    VtSqlOps.attr("rows_added", LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val staged = VersionedTable.stagedCommit(spark, path, stageId)
    val rows = VersionedTable.readStaged(spark, path, staged).count()
    val v = VersionedTable.publishStaged(spark, path, staged)
    Seq(Row(stageId, v, rows))
  }
}

/** `ABORT STAGE '<id>' IN <tbl>`: drop a pending stage by id; refuses a
  * published one (those files belong to the table). */
final case class VtAbortStageCommand(tableParts: Seq[String], stageId: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("stage_id", StringType), VtSqlOps.attr("aborted", BooleanType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val staged = VersionedTable.stagedCommit(spark, path, stageId)
    // refuse published-then-EXPIRED too (abortStaged itself only refuses
    // manifest-referenced stages): an adopted stage is vacuum's business
    require(VersionedTable.stages(spark, path).find(_.id == stageId).exists(!_.published),
      s"stage $stageId was published — VACUUM reclaims it once its references expire")
    VersionedTable.abortStaged(spark, path, staged)
    Seq(Row(stageId, true))
  }
}

final case class VtOptimizeCommand(
    tableParts: Seq[String], targetRows: Long, zOrder: Boolean,
    scope: Option[(String, Long, Long)] = None)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    VtSqlOps.attr("new_version", LongType),
    VtSqlOps.attr("files_rewritten", LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = VtSqlOps.resolvePath(spark, tableParts)
    val (v, rewritten) =
      VersionedTable.compact(spark, path, targetRows, zOrder = zOrder, scope = scope)
    Seq(Row(v, rewritten))
  }
}
