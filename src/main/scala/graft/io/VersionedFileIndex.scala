package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  In, InSet, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Planning-time file skipping for [[VersionedTable]] driven by ordinary
  * Catalyst predicates — the Delta/Iceberg integration shape: instead of
  * the caller naming ranges/keys through `readWhere`/`readKeys`, the
  * table is exposed through a custom [[FileIndex]] and Catalyst hands the
  * scan's data filters to [[listFiles]] during physical planning. A plain
  * `table.filter($"id" === 42).count()` then opens only the files whose
  * manifest key ranges intersect AND whose bloom sidecars admit the key —
  * visible in the plan's `numFiles` metric, with the vectorized parquet
  * reader, row-group pushdown and column pruning all intact (this index
  * slots into the standard `HadoopFsRelation`, it does not replace the
  * reader).
  *
  * Pruning is sound-by-construction: strict comparisons tighten by one
  * with Long-overflow guards (an impossible bound yields the canonical
  * empty interval), non-integral literals and columns without recorded
  * stats never prune, and bloom-uncovered files always survive — safety
  * over sharpness, same policy as `filesForRanges`.
  *
  * The bloom probe runs as a (tiny) distributed job during planning —
  * sidecar rows ∝ files, only (file, verdict) booleans collect — the
  * same per-FILE metadata trade the rest of the format makes. */
final class VersionedFileIndex(
    spark: SparkSession,
    tablePath: String,
    relFiles: Seq[String],
    ranges: Map[(String, String), (Long, Long)],
    bloomSidecars: Seq[String],
    statuses: Map[String, FileStatus])
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(s"$tablePath/data"))
  override def partitionSchema: StructType = new StructType()
  override def refresh(): Unit = ()
  override def inputFiles: Array[String] =
    relFiles.map(n => s"$tablePath/data/$n").toArray
  override def sizeInBytes: Long = relFiles.map(n => statuses(n).getLen).sum

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val conjuncts = dataFilters.flatMap(flatten)
    val bounds = collectBounds(conjuncts)
    // a column whose conjuncts intersect to an empty interval can match
    // no row anywhere — zero files, regardless of per-file ranges
    val kept =
      if (bounds.exists { case (_, (lo, hi)) => lo > hi }) Seq.empty[String]
      else {
        val rangeKept = relFiles.filter { f =>
          bounds.forall { case (c, (lo, hi)) =>
            ranges.get((f, c)).forall { case (flo, fhi) => fhi >= lo && flo <= hi }
          }
        }
        bloomPrune(rangeKept, collectPointKeys(conjuncts))
      }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(statuses(_)).toArray))
  }

  private def flatten(e: Expression): Seq[Expression] = e match {
    case And(l, r) => flatten(l) ++ flatten(r)
    case other => Seq(other)
  }

  /** The column name a comparison side refers to, seeing through the
    * implicit integral widening cast the analyzer inserts. */
  private def attrOf(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name)
    case c: Cast if integral(c.dataType) => attrOf(c.child)
    case _ => None
  }

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: java.lang.Integer, _) => Some(v.longValue)
    case Literal(v: java.lang.Long, _) => Some(v)
    case Literal(v: java.lang.Short, _) => Some(v.longValue)
    case Literal(v: java.lang.Byte, _) => Some(v.longValue)
    case _ => None
  }

  /** col -> tightest [lo, hi] implied by the conjuncts; (1, 0) is the
    * canonical empty interval for an unsatisfiable strict bound. */
  private def collectBounds(conjuncts: Seq[Expression]): Map[String, (Long, Long)] = {
    val perCol = conjuncts.flatMap {
      case EqualTo(l, r) =>
        attrOf(l).zip(litLong(r)).map { case (c, v) => c -> (v, v) } ++
          attrOf(r).zip(litLong(l)).map { case (c, v) => c -> (v, v) }
      case GreaterThan(l, r) =>
        attrOf(l).zip(litLong(r)).map { case (c, v) =>
          c -> (if (v == Long.MaxValue) (1L, 0L) else (v + 1, Long.MaxValue)) } ++
          attrOf(r).zip(litLong(l)).map { case (c, v) =>
            c -> (if (v == Long.MinValue) (1L, 0L) else (Long.MinValue, v - 1)) }
      case GreaterThanOrEqual(l, r) =>
        attrOf(l).zip(litLong(r)).map { case (c, v) => c -> (v, Long.MaxValue) } ++
          attrOf(r).zip(litLong(l)).map { case (c, v) => c -> (Long.MinValue, v) }
      case LessThan(l, r) =>
        attrOf(l).zip(litLong(r)).map { case (c, v) =>
          c -> (if (v == Long.MinValue) (1L, 0L) else (Long.MinValue, v - 1)) } ++
          attrOf(r).zip(litLong(l)).map { case (c, v) =>
            c -> (if (v == Long.MaxValue) (1L, 0L) else (v + 1, Long.MaxValue)) }
      case LessThanOrEqual(l, r) =>
        attrOf(l).zip(litLong(r)).map { case (c, v) => c -> (Long.MinValue, v) } ++
          attrOf(r).zip(litLong(l)).map { case (c, v) => c -> (v, Long.MaxValue) }
      case In(a, vs) if vs.nonEmpty && vs.forall(litLong(_).isDefined) =>
        attrOf(a).map { c =>
          val longs = vs.flatMap(litLong)
          c -> (longs.min, longs.max)
        }
      case _ => Nil
    }
    perCol.groupBy(_._1).map { case (c, bs) =>
      c -> (bs.map(_._2._1).max, bs.map(_._2._2).min)
    }
  }

  /** col -> the exact key set a point predicate admits (for bloom probes;
    * only = and IN produce one). */
  private def collectPointKeys(conjuncts: Seq[Expression]): Map[String, Array[Long]] = {
    val perCol = conjuncts.flatMap {
      case EqualTo(l, r) =>
        attrOf(l).zip(litLong(r)).map { case (c, v) => c -> Seq(v) } ++
          attrOf(r).zip(litLong(l)).map { case (c, v) => c -> Seq(v) }
      case In(a, vs) if vs.nonEmpty && vs.forall(litLong(_).isDefined) =>
        attrOf(a).map(c => c -> vs.flatMap(litLong))
      case InSet(a, hset) if hset.nonEmpty && hset.forall(_.isInstanceOf[java.lang.Number]) =>
        attrOf(a).map(c => c -> hset.toSeq.map(_.asInstanceOf[java.lang.Number].longValue))
      case _ => Nil
    }
    // several point conjuncts on one column intersect; keep the smallest
    // set — any key the file must contain suffices for a sound probe
    perCol.groupBy(_._1).map { case (c, ks) =>
      c -> ks.map(_._2).minBy(_.size).toArray
    }
  }

  /** Drop candidates whose bloom (when present) rejects EVERY key of some
    * probed column. Distributed sidecar scan; only verdicts collect. */
  private def bloomPrune(
      candidates: Seq[String], keysByCol: Map[String, Array[Long]]): Seq[String] = {
    if (bloomSidecars.isEmpty || keysByCol.isEmpty || candidates.isEmpty) return candidates
    import spark.implicits._
    val candSet = candidates.toSet
    val colSet = keysByCol.keySet
    val rows = spark.read.parquet(bloomSidecars.map(n => s"$tablePath/data/$n"): _*)
      .as[(String, String, Int, Int, Array[Byte])]
      .filter(r => candSet.contains(r._1) && colSet.contains(r._2))
    val keysB = spark.sparkContext.broadcast(keysByCol)
    val rejected = rows.mapPartitions { it =>
      val kb = keysB.value
      it.collect {
        case (f, c, m, _, bits) if !kb(c).exists(k => FileBloom.mightContain(m, bits, k)) => f
      }
    }.collect().toSet
    keysB.destroy()
    candidates.filterNot(rejected)
  }
}
