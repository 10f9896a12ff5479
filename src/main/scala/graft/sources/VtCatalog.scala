package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.VersionedTable

/** The versioned table as a SQL-first citizen: a DataSource V2
  * [[TableCatalog]], so the whole table-format lifecycle runs from
  * `spark.sql` with no Scala handle — the integration Delta/Iceberg ship
  * and a lakehouse user expects:
  *
  * {{{
  *   spark.conf: spark.sql.catalog.vt           = graft.sources.VtCatalog
  *               spark.sql.catalog.vt.warehouse = /warehouse   (optional)
  *   CREATE TABLE vt.events (id BIGINT, v STRING)
  *   INSERT INTO vt.events SELECT ...            -- append commit
  *   INSERT OVERWRITE vt.events SELECT ...       -- overwrite commit
  *   SELECT * FROM vt.events                     -- snapshot read
  *   SELECT * FROM vt.events VERSION AS OF 3     -- time travel
  *   SELECT * FROM vt.events TIMESTAMP AS OF '...'
  *   ALTER TABLE vt.events RENAME COLUMN v TO label
  *   SELECT * FROM vt.`/abs/path/tbl`            -- path as identifier
  *   DELETE FROM vt.events WHERE id % 10 = 3     -- file-surgery delete
  *   UPDATE vt.events SET v = concat(v, '!') WHERE id < 10 -- COW update
  *   MERGE INTO vt.events t USING batch b        -- CDC upsert+delete
  *     ON t.id = b.id
  *     WHEN MATCHED AND b.op = 'D' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED AND b.op <> 'D' THEN INSERT *
  * }}}
  *
  * DML resolves through [[VtDmlRule]] (see its scaladoc for the exact
  * supported MERGE shape and why conditions are source-only).
  *
  * Reads go through the V1 connector bridge ([[V1Scan]] — the same public
  * seam Spark's own JDBC v2 uses): pushed filters and the pruned column
  * set are applied to [[VersionedTable.table]]'s predicate-pruning
  * DataFrame, so manifest range/bloom FILE pruning, parquet row-group
  * pushdown, and the vectorized reader all run inside the inner plan; the
  * V1 seam costs one row-conversion boundary at the scan edge. Spark
  * re-applies every pushed filter above the seam (they are reported as
  * residuals), so a translation gap can only lose pruning, never rows.
  * Scala-native callers keep [[VersionedTable.table]] for a zero-seam
  * scan; SQL gets the full lifecycle. NOTE the seam also erases the
  * scan's reported PARTITIONING: a co-bucketed join written against
  * `vt.` catalog references still shuffles (the bucket-key FILE pruning
  * survives — it runs inside the inner plan — but the
  * HashPartitioning claim does not cross an RDD boundary). For
  * exchange-free SQL joins on claimed tables, register a temp view over
  * [[VersionedTable.table]] (`table(spark, p).createOrReplaceTempView`)
  * — the view keeps the BucketSpec scan and plans like the Scala path
  * (spec-pinned in BucketPruneSpec).
  *
  * Writes are exactly the library's commit paths ([[VersionedTable
  * .commitAppend]] / [[VersionedTable.overwrite]]): CHECK constraints
  * enforce, schema merges widen, the manifest race is the commit point.
  * Time-travel identifiers are read-only (INSERT into `VERSION AS OF`
  * refuses).
  */
class VtCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def pathOf(ident: Identifier): String =
    if (ident.name.startsWith("/")) {
      require(ident.namespace.isEmpty,
        s"path identifiers take no namespace, got ${ident.namespace.mkString(".")}")
      ident.name
    } else warehouse match {
      case Some(w) => (w +: ident.namespace.toSeq :+ ident.name).mkString("/")
      case None => throw new IllegalArgumentException(
        s"catalog '$catalogName' has no warehouse configured — set " +
          s"spark.sql.catalog.$catalogName.warehouse or use a /path identifier")
    }

  private def fs(p: String): FileSystem =
    FileSystem.get(new java.net.URI(p), spark.sparkContext.hadoopConfiguration)

  override def tableExists(ident: Identifier): Boolean =
    VersionedTable.versions(spark, pathOf(ident)).nonEmpty

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val path = pathOf(ident)
    if (VersionedTable.versions(spark, path).isEmpty) throw new NoSuchTableException(ident)
    new VtTable(path, ident.toString, version)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <n | 'tag'>` — Spark hands the literal through as a
    * string; a non-numeric literal resolves as a NAMED TAG (release
    * pins), so `SELECT ... VERSION AS OF 'v1.0'` reads what the release
    * shipped. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(
      try version.toLong
      catch { case _: NumberFormatException =>
        try VersionedTable.tagVersion(spark, pathOf(ident), version)
        catch { case e: Exception => throw new IllegalArgumentException(
          s"VERSION AS OF takes a version number or a tag name for " +
            s"'$catalogName' tables; '$version' is neither (${e.getMessage})") }
      }))

  /** `TIMESTAMP AS OF <ts>` — micros since epoch, resolved against
    * manifest commit times ([[VersionedTable.versionAt]]). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    if (VersionedTable.versions(spark, path).isEmpty) throw new NoSuchTableException(ident)
    load(ident, Some(VersionedTable.versionAt(spark, path, timestamp / 1000L)))
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // the one physical-layout DDL the engine accepts: CLUSTERED BY
    // (key, ...) INTO n BUCKETS — the table carries the bucket claim
    // (single OR composite: the tuple hashes as a whole, key order
    // matters) from v1, every INSERT routes through the bucketed writer,
    // and co-bucketed joins plan exchange-free. Hive-style PARTITIONED BY
    // still refuses: range and multi-dim clustering go through
    // statsCols/Z-order instead.
    val bucketing: Option[(String, Int)] = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if org.apache.spark.sql.graft.bridge.bucketTransform(t)
          .exists(_._2.nonEmpty) =>
        org.apache.spark.sql.graft.bridge.bucketTransform(t)
          .map { case (n, cols) => (cols.mkString(","), n) }
      case _ => throw new UnsupportedOperationException(
        "graft versioned tables take CLUSTERED BY (col, ...) INTO n BUCKETS or no " +
          "partitioning (range/multi-dim clustering goes via statsCols/Z-order, " +
          "not PARTITIONED BY)")
    }
    val path = pathOf(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    VersionedTable.create(spark, path, schema, bucketing)
    new VtTable(path, ident.toString, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    if (VersionedTable.versions(spark, path).isEmpty) throw new NoSuchTableException(ident)
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1, "nested column renames are not supported")
        VersionedTable.renameColumn(spark, path, r.fieldNames.head, r.newName)
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1, "nested column adds are not supported")
        require(a.isNullable,
          "added columns must be nullable (history cannot be backfilled)")
        VersionedTable.addColumn(spark, path, a.fieldNames.head, a.dataType)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1, "nested column drops are not supported")
        VersionedTable.dropColumn(spark, path, d.fieldNames.head)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change ${other.getClass.getSimpleName} is not supported " +
          "(supported: RENAME COLUMN, ADD COLUMN, DROP COLUMN; type widening happens on write)")
    }
    load(ident, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    val f = fs(path)
    val p = new Path(path)
    f.exists(p) && VersionedTable.versions(spark, path).nonEmpty && f.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = pathOf(oldIdent); val to = pathOf(newIdent)
    if (VersionedTable.versions(spark, from).isEmpty) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val f = fs(from)
    f.mkdirs(new Path(to).getParent)
    require(f.rename(new Path(from), new Path(to)), s"rename $from -> $to failed")
  }

  /** Directories under warehouse/namespace that hold a committed table. */
  override def listTables(namespace: Array[String]): Array[Identifier] = warehouse match {
    case None => Array.empty
    case Some(w) =>
      val dir = new Path((w +: namespace.toSeq).mkString("/"))
      val f = fs(w)
      if (!f.exists(dir)) Array.empty
      else f.listStatus(dir).toSeq
        .filter(s => s.isDirectory &&
          VersionedTable.versions(spark, s.getPath.toUri.getPath).nonEmpty)
        .map(s => Identifier.of(namespace, s.getPath.getName))
        .toArray
  }
}

/** One versioned table (optionally pinned to a time-travel version) as a
  * DSv2 [[Table]]. See [[VtCatalog]] for the architecture; `MERGE INTO` /
  * arbitrary-predicate `DELETE FROM` land via [[VtDmlRule]], while the
  * standard [[SupportsDelete]] seam below covers V1-translatable deletes
  * even when [[graft.GraftExtensions]] is not injected. */
final class VtTable(path: String, identName: String, version: Option[Long])
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  private[graft] def tablePath: String = path
  private[graft] def timeTravelVersion: Option[Long] = version

  private def spark: SparkSession = SparkSession.active

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    version.isEmpty && filters.forall(f => VtTable.translate(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(version.isEmpty, s"cannot DELETE from time-travel identifier ${name()}")
    VersionedTable.deleteWhere(spark, path,
      filters.flatMap(VtTable.translate).reduceOption(_ && _)
        .getOrElse(org.apache.spark.sql.functions.lit(true)))
    ()
  }

  override def name(): String =
    version.fold(identName)(v => s"$identName@v$v")

  override def schema(): StructType = VersionedTable.tableSchema(spark, path, version)

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
      private var pushed: Array[Filter] = Array.empty
      private var required: StructType = schema()

      /** Translatable filters are remembered for FILE pruning inside the
        * inner scan; ALL filters are returned as residual so Spark
        * re-applies them above the seam — pruning is an optimization here,
        * never the correctness boundary. */
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(VtTable.translate(_).isDefined)
        filters
      }
      override def pushedFilters(): Array[Filter] = pushed

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = new V1Scan
          with org.apache.spark.sql.connector.read.SupportsReportStatistics {
        // Manifest-derived stats let Catalyst pick a broadcast join for a
        // small vt dim at PLAN time (without them a DSv2 relation defaults
        // to spark.sql.defaultSizeInBytes = Long.Max — never broadcast
        // until AQE re-plans). Metadata-only: file lengths + recorded row
        // counts; rows absent on partial coverage rather than scanning.
        override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
          val (bytes, rows) = VersionedTable.plannerStats(spark, path, version)
          new org.apache.spark.sql.connector.read.Statistics {
            override def sizeInBytes(): java.util.OptionalLong =
              java.util.OptionalLong.of(bytes)
            override def numRows(): java.util.OptionalLong =
              rows.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
          }
        }
        override def readSchema(): StructType = required
        override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = required
            override def buildScan(): RDD[Row] = {
              var df = VersionedTable.table(ctx.sparkSession, path, version)
              pushed.flatMap(VtTable.translate).foreach(c => df = df.filter(c))
              val cols = required.fieldNames
              (if (cols.isEmpty) df else df.select(cols.map(col).toIndexedSeq: _*)).rdd
            }
          }.asInstanceOf[T]
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(version.isEmpty, s"cannot write to time-travel identifier $identName@v${version.get}")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: DataFrame, overwriteFlag: Boolean) => {
            if (overwrite || overwriteFlag) VersionedTable.overwrite(data, path)
            else VersionedTable.bucketing(spark, path) match {
              // a SQL INSERT INTO a bucketed table must HONOR the layout:
              // a plain append would silently drop the claim and cost
              // every downstream co-bucketed join its exchange-free plan
              // (the Scala commitAppend keeps its documented drop
              // semantics — SQL users have no other writer to choose)
              case Some((k, n)) => VersionedTable.commitBucketed(data, path, k, n)
              case None => VersionedTable.commitAppend(data, path)
            }
            ()
          }
      }
    }
  }
}

object VtTable {
  /** V1 [[Filter]] → [[Column]], for the file-pruning push into the inner
    * scan. Partial by design: an untranslated filter is simply not pruned
    * on (Spark re-applies everything above the seam). */
  private[graft] def translate(f: Filter): Option[Column] = f match {
    case sources.AlwaysTrue() => Some(org.apache.spark.sql.functions.lit(true))
    case sources.AlwaysFalse() => Some(org.apache.spark.sql.functions.lit(false))
    case sources.EqualTo(a, v) => Some(col(a) === v)
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> v)
    case sources.GreaterThan(a, v) => Some(col(a) > v)
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case sources.LessThan(a, v) => Some(col(a) < v)
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= v)
    case sources.In(a, vs) => Some(col(a).isInCollection(vs.toIndexedSeq))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case sources.Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case sources.Not(c) => translate(c).map(!_)
    case _ => None
  }
}
