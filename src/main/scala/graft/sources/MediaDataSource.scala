package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Multimodal

/** DataSource V2 `graft-media`: a directory of raw media container files
  * (`<doc_id>.png` / `.bmp` / `.wav`) exposed as a table — the "crawled
  * media corpus on shared storage" shape, where metadata must come from
  * the container headers themselves rather than a sidecar catalog
  * (reference reads all input through registered sources,
  * `Cleaning.scala:22-28`, `SQLOperations.scala:12-15`; this is that idea
  * carried to binary corpora).
  *
  * Scale design — the two DSv2 contracts are load-bearing, not decorative:
  *
  *  - '''Filter pushdown''' (`SupportsPushDownFilters`): predicates on
  *    `doc_id` (filename stem), `format` (extension) and `n_bytes` (file
  *    size) are evaluated against directory metadata at PLANNING time —
  *    pruned files are never opened, so `WHERE format = 'png'` over a
  *    100 TB mixed corpus does no I/O at all on the losers. Pushed
  *    filters are removed from the residual (fully consumed).
  *  - '''Column pruning''' (`SupportsPushDownRequiredColumns`): when the
  *    `media` payload column is not required, readers fetch only the
  *    fixed-size header prefix (64 B) instead of whole files — a
  *    metadata-only scan reads ~0.01% of the corpus bytes.
  *
  * Files are split into `spark.graft.media.filesPerPartition`-sized input
  * partitions (default 512) in doc_id order, so a 10⁸-file corpus plans
  * ~200k partitions of bounded size rather than one per file.
  */
class MediaDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-media"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MediaTable.Schema

  /** Writes pass the DataFrame's schema through `getTable` (e.g. just
    * (doc_id, media)); reads with no user schema land on [[inferSchema]]'s
    * full table schema. */
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-media requires a path, e.g. .load(dir)"))
    new MediaTable(path, schema)
  }
}

object MediaTable {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true)))

  /** Bytes sufficient for every header parse this source does (PNG
    * sig+IHDR = 33, BMP = 54, WAV fmt = 44; 64 covers all with slack). */
  val HeaderBytes = 64

  final case class FileMeta(path: String, docId: Long, format: String, nBytes: Long)

  /** Catalog-resolved tables hand the location back as a `file:` URI;
    * direct `.load(dir)` hands a plain path. Accept both. */
  def toLocalPath(path: String): String =
    if (path.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(path)).toString
    else path

  def listFiles(dir: String): Seq[FileMeta] = {
    val d = new java.io.File(toLocalPath(dir))
    val files = Option(d.listFiles()).getOrElse(Array.empty).toSeq
    files.flatMap { f =>
      val name = f.getName
      val dot = name.lastIndexOf('.')
      if (!f.isFile || dot <= 0) None
      else {
        val stem = name.substring(0, dot)
        val ext = name.substring(dot + 1).toLowerCase
        stem.toLongOption.collect {
          case id if Set("png", "bmp", "wav").contains(ext) =>
            FileMeta(f.getAbsolutePath, id, ext, f.length())
        }
      }
    }.sortBy(_.docId)
  }
}

class MediaTable(path: String, tableSchema: StructType = MediaTable.Schema)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-media:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MediaScanBuilder(path, tableSchema, options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MediaWriteBuilder(path, info)
}

/** Write side: each input row (`doc_id` bigint, `media` binary) lands as
  * `<doc_id>.<ext>` with the extension sniffed from the container magic
  * (the formats [[MediaScan]] reads back). Writers stream rows straight to
  * files — task retries are idempotent because the filename is a pure
  * function of the row. `.mode("overwrite")` truncates: recognized media
  * files under the directory are deleted at job start (driver-side, before
  * any task runs). */
class MediaWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val fields = info.schema().fieldNames.toSeq
    require(fields.contains("doc_id") && fields.contains("media"),
      s"graft-media write needs doc_id and media columns, got ${fields.mkString(", ")}")
    new Write {
      override def toBatch: BatchWrite = new BatchWrite {
        override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory = {
          val local = MediaTable.toLocalPath(path)
          if (doTruncate)
            MediaTable.listFiles(local).foreach(m => new java.io.File(m.path).delete())
          new java.io.File(local).mkdirs()
          val docIdx = info.schema().fieldIndex("doc_id")
          val mediaIdx = info.schema().fieldIndex("media")
          MediaWriterFactory(local, docIdx, mediaIdx)
        }
        override def commit(messages: Array[WriterCommitMessage]): Unit = ()
        override def abort(messages: Array[WriterCommitMessage]): Unit = ()
      }
    }
  }
}

final case class MediaWriterFactory(path: String, docIdx: Int, mediaIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val docId = row.getLong(docIdx)
        val bytes = row.getBinary(mediaIdx)
        val ext =
          if (graft.ops.Multimodal.parsePng(docId, bytes).isDefined) "png"
          else if (graft.ops.Multimodal.parseBmp(docId, bytes).isDefined) "bmp"
          else if (graft.ops.Multimodal.parseWav(docId, bytes).isDefined) "wav"
          else "bin"
        java.nio.file.Files.write(java.nio.file.Paths.get(path, s"$docId.$ext"), bytes)
      }
      override def commit(): WriterCommitMessage = new WriterCommitMessage {}
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

class MediaScanBuilder(path: String, tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var aggregation: Option[Aggregation] = None

  /** COUNT / MIN / MAX / SUM / AVG over planning-time columns (and GROUP
    * BY over them) are answerable from the directory listing alone —
    * `SELECT format, count(*), sum(n_bytes) ... GROUP BY format` over a
    * 100 TB corpus opens ZERO files. Complete pushdown (not partial):
    * the listing is global, so the source returns final rows and Spark
    * plans no aggregate at all. Spark only offers an aggregation when
    * every filter was consumed by [[pushFilters]], so a residual
    * header-column predicate (width, media…) correctly disables this. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    MediaAgg.supported(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    MediaAgg.supported(agg) && { aggregation = Some(agg); true }

  /** One file is one row, so a pushed limit prunes the PLANNING-TIME file
    * list after the pushed filters: `LIMIT 5` over a 100 TB corpus opens
    * five files. Spark only offers the limit when the operators between
    * scan and limit preserve it, and keeps its own limit above (we report
    * the default partial push), so residual filters stay correct.
    * Deterministic because the listing is docId-sorted. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** A filter is pushable iff it references only planning-time columns
    * (doc_id / format / n_bytes — all known from the directory listing). */
  private def pushable(f: Filter): Boolean = {
    val planningCols = Set("doc_id", "format", "n_bytes")
    f.references.nonEmpty && f.references.forall(planningCols.contains) && (f match {
      case _: sources.EqualTo | _: sources.GreaterThan | _: sources.GreaterThanOrEqual |
           _: sources.LessThan | _: sources.LessThanOrEqual | _: sources.In |
           _: sources.And | _: sources.Or => true
      case _ => false
    })
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (p, residual) = filters.partition(pushable)
    pushed = p
    residual // pushed filters are fully evaluated per file — no re-check needed
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val perPart = Option(options.get("filesPerPartition")).map(_.toInt).getOrElse(512)
    new MediaScan(path, required, pushed, perPart, limit, aggregation)
  }
}

/** Planning-time aggregation over the directory listing (see
  * [[MediaScanBuilder.supportCompletePushDown]]). The result-row schema
  * follows the DSv2 contract: group-by columns first, then one column per
  * aggregate, positionally matched by Spark. */
object MediaAgg {
  private val LongCols = Set("doc_id", "n_bytes")
  private val PlanningCols = LongCols + "format"

  private def colName(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
    case _ => None
  }

  private def funcCol(f: AggregateFunc): Option[String] = f match {
    case _: CountStar => Some("doc_id") // any planning col; never read
    case c: Count     => colName(c.column)
    case m: Min       => colName(m.column)
    case m: Max       => colName(m.column)
    case s: Sum       => colName(s.column)
    case a: Avg       => colName(a.column)
    case _            => None
  }

  def supported(agg: Aggregation): Boolean = {
    val groupsOk = agg.groupByExpressions.forall(colName(_).exists(PlanningCols))
    val funcsOk = agg.aggregateExpressions.forall { f =>
      funcCol(f).exists { c =>
        f match {
          case _: CountStar | _: Count => PlanningCols(c)
          case _: Min | _: Max         => PlanningCols(c)
          case _: Sum | _: Avg         => LongCols(c) // no numeric sum over format
          case _                       => false
        }
      }
    }
    groupsOk && funcsOk && agg.aggregateExpressions.nonEmpty
  }

  /** Output schema: group cols (table types) then aggregate results —
    * COUNT → long, MIN/MAX → column type, SUM → long, AVG → double. */
  def schema(agg: Aggregation): StructType = {
    val groupFields = agg.groupByExpressions.toSeq.map { g =>
      MediaTable.Schema(colName(g).get)
    }
    val aggFields = agg.aggregateExpressions.toSeq.map { f =>
      val c = funcCol(f).get
      f match {
        case _: CountStar => StructField("count(*)", LongType, nullable = false)
        case _: Count     => StructField(s"count($c)", LongType, nullable = false)
        case _: Min       => StructField(s"min($c)", MediaTable.Schema(c).dataType)
        case _: Max       => StructField(s"max($c)", MediaTable.Schema(c).dataType)
        case _: Sum       => StructField(s"sum($c)", LongType)
        case _: Avg       => StructField(s"avg($c)", DoubleType)
      }
    }
    StructType(groupFields ++ aggFields)
  }

  private def value(m: MediaTable.FileMeta, col: String): Any = col match {
    case "doc_id"  => m.docId
    case "format"  => m.format
    case "n_bytes" => m.nBytes
  }

  /** Final aggregate rows over the (already filter-pruned) file listing.
    * SQL semantics at the edges: a global aggregate over zero files still
    * yields one row (count 0, null min/max/sum/avg); a grouped aggregate
    * yields zero rows. Values are raw (String, not UTF8String) — the
    * reader converts at row build. */
  def compute(agg: Aggregation, files: Seq[MediaTable.FileMeta]): Seq[Seq[Any]] = {
    val groupCols = agg.groupByExpressions.toSeq.map(colName(_).get)
    val groups: Seq[(Seq[Any], Seq[MediaTable.FileMeta])] =
      if (groupCols.isEmpty) Seq(Seq.empty[Any] -> files)
      else files.groupBy(m => groupCols.map(value(m, _))).toSeq
    groups.map { case (key, fs) =>
      val aggVals = agg.aggregateExpressions.toSeq.map { f =>
        val c = funcCol(f).get
        def longs = fs.map(value(_, c).asInstanceOf[Long])
        def longsMaybeDistinct(d: Boolean) = if (d) longs.distinct else longs
        f match {
          case _: CountStar => fs.size.toLong
          case ct: Count =>
            (if (ct.isDistinct) fs.map(value(_, c)).distinct else fs).size.toLong
          case _: Min => if (fs.isEmpty) null else fs.map(value(_, c)).minBy(ord(c))
          case _: Max => if (fs.isEmpty) null else fs.map(value(_, c)).maxBy(ord(c))
          case s: Sum => if (fs.isEmpty) null else longsMaybeDistinct(s.isDistinct).sum
          case a: Avg =>
            if (fs.isEmpty) null
            else {
              val xs = longsMaybeDistinct(a.isDistinct)
              xs.sum.toDouble / xs.size
            }
        }
      }
      key ++ aggVals
    }
  }

  // min/max need one ordering per column type; planning cols are Long or String
  private def ord(col: String): Any => (Long, String) =
    if (LongCols(col)) v => (v.asInstanceOf[Long], "") else v => (0L, v.asInstanceOf[String])
}

class MediaScan(
    path: String, required: StructType, pushed: Array[Filter], filesPerPartition: Int,
    limit: Option[Int] = None, aggregation: Option[Aggregation] = None)
    extends Scan with Batch {

  override def readSchema(): StructType =
    aggregation.fold(required)(MediaAgg.schema)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-media $path, ReadSchema: ${readSchema().catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      limit.map(l => s", PushedLimit: $l").getOrElse("") +
      aggregation.map(a =>
        s", PushedAggregation: [${a.aggregateExpressions.mkString(", ")}]" +
          s", PushedGroupBy: [${a.groupByExpressions.mkString(", ")}]").getOrElse("")

  /** Planning-time filter evaluation over directory metadata only. */
  private def keep(m: MediaTable.FileMeta)(f: Filter): Boolean = {
    def v(col: String): Any = col match {
      case "doc_id" => m.docId
      case "format" => m.format
      case "n_bytes" => m.nBytes
    }
    def cmp(col: String, x: Any): Int = (v(col), x) match {
      case (a: Long, b: Number) => java.lang.Long.compare(a, b.longValue())
      case (a: String, b) => a.compareTo(b.toString)
      case _ => throw new IllegalStateException(s"unexpected pushed comparison on $col")
    }
    f match {
      case sources.EqualTo(c, x) => cmp(c, x) == 0
      case sources.GreaterThan(c, x) => cmp(c, x) > 0
      case sources.GreaterThanOrEqual(c, x) => cmp(c, x) >= 0
      case sources.LessThan(c, x) => cmp(c, x) < 0
      case sources.LessThanOrEqual(c, x) => cmp(c, x) <= 0
      case sources.In(c, xs) => xs.exists(x => cmp(c, x) == 0)
      case sources.And(l, r) => keep(m)(l) && keep(m)(r)
      case sources.Or(l, r) => keep(m)(l) || keep(m)(r)
      case other => throw new IllegalStateException(s"unpushable filter pushed: $other")
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val filtered = MediaTable.listFiles(path).filter(m => pushed.forall(keep(m)))
    aggregation match {
      case Some(agg) =>
        // complete pushdown: aggregate the listing HERE, at planning time —
        // the one task just emits the precomputed rows (a pushed LIMIT, if
        // any, applies to result rows; Spark re-applies it above anyway)
        val rows = MediaAgg.compute(agg, filtered)
        Array(AggResultPartition(limit.fold(rows)(rows.take).map(_.toArray).toArray))
      case None =>
        val files = limit.fold(filtered)(filtered.take) // 1 file == 1 row
        files.grouped(filesPerPartition).map(g => MediaInputPartition(g.toArray)).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MediaReaderFactory(required)
}

/** Precomputed aggregate rows (raw JVM values; strings converted to
  * UTF8String at read). */
final case class AggResultPartition(rows: Array[Array[Any]]) extends InputPartition

final case class MediaInputPartition(files: Array[MediaTable.FileMeta])
    extends InputPartition

class MediaReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case AggResultPartition(rows) =>
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = InternalRow.fromSeq(rows(i).toSeq.map {
            case s: String => UTF8String.fromString(s)
            case v         => v
          })
          override def close(): Unit = ()
        }
      case p: MediaInputPartition => new MediaPartitionReader(p.files, required)
    }
}

/** Per-partition reader: one file per `next()`. Reads the whole file only
  * when the `media` column is required; header-only (64 B) otherwise. */
class MediaPartitionReader(files: Array[MediaTable.FileMeta], required: StructType)
    extends PartitionReader[InternalRow] {

  private val needMedia = required.fieldNames.contains("media")
  private val needDims = Seq("width", "height", "channels")
    .exists(required.fieldNames.contains)
  private var i = -1
  private var row: InternalRow = _

  private def readBytes(m: MediaTable.FileMeta): Array[Byte] = {
    if (needMedia) java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(m.path))
    else {
      val in = new java.io.FileInputStream(m.path)
      try {
        val buf = new Array[Byte](math.min(MediaTable.HeaderBytes.toLong, m.nBytes).toInt)
        var off = 0
        while (off < buf.length) {
          val r = in.read(buf, off, buf.length - off)
          if (r < 0) throw new java.io.EOFException(m.path)
          off += r
        }
        buf
      } finally in.close()
    }
  }

  override def next(): Boolean = {
    i += 1
    if (i >= files.length) return false
    val m = files(i)
    // header parse only when a dims column survives pruning
    val bytes = if (needDims || needMedia) readBytes(m) else Array.emptyByteArray
    val meta: Option[Multimodal.ImageMeta] =
      if (!needDims) None
      else Multimodal.parsePng(m.docId, bytes)
        .orElse(Multimodal.parseBmp(m.docId, bytes, m.nBytes))
        .orElse(Multimodal.parseWav(m.docId, bytes, m.nBytes).map(w =>
          Multimodal.ImageMeta(m.docId, "wav", 0, 0, w.bits_per_sample, w.channels)))
    row = InternalRow.fromSeq(required.fieldNames.toSeq.map {
      case "doc_id" => m.docId
      case "format" => UTF8String.fromString(m.format)
      case "width" => meta.map(_.width).orNull
      case "height" => meta.map(_.height).orNull
      case "channels" => meta.map(_.channels).orNull
      case "n_bytes" => m.nBytes
      case "media" => if (needMedia) bytes else null
      case other => throw new IllegalStateException(s"unknown column $other")
    })
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
