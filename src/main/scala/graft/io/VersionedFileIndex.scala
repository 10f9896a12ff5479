package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, StartsWith}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One manifest-stats bound in its column's comparison domain. Every
  * column prunes in exactly ONE domain, decided by the manifest: columns
  * in the typed (stats3) channel compare as raw UTF-8 bytes (string —
  * Spark's own UTF8String order), epoch days (date), epoch micros
  * (timestamp) or IEEE doubles (java total order, so NaN sorts greatest
  * exactly as Spark's comparisons treat it); everything else uses the
  * long (stats2) channel. Keeping the domain per-column is what makes a
  * TIMESTAMP literal (micros) impossible to compare against the long
  * channel's epoch-second ranges — the silent-empty-result hazard the
  * pre-typed index had. */
private[io] sealed trait StatBound
private[io] object StatBound {
  final case class S(v: Array[Byte]) extends StatBound
  final case class L(v: Long) extends StatBound
  final case class D(v: Double) extends StatBound
  final case class C(v: java.math.BigDecimal) extends StatBound

  /** Total order within one domain; mixed forms are a routing bug. */
  def cmp(a: StatBound, b: StatBound): Int = (a, b) match {
    case (S(x), S(y)) => java.util.Arrays.compareUnsigned(x, y)
    case (L(x), L(y)) => java.lang.Long.compare(x, y)
    case (D(x), D(y)) => java.lang.Double.compare(x, y)
    // compareTo, not equals: 10.50 and 10.5 are the same value (scale
    // is representation, not identity — matching Spark's decimal order)
    case (C(x), C(y)) => x.compareTo(y)
    case _ => sys.error(s"mixed stat-bound domains: $a vs $b")
  }

  /** −0.0 → 0.0 so the D domain's total order cannot split a value
    * Spark's equality treats as one (stats writers normalize the same
    * way: the 'F' slot aggregates x + 0.0). NaN passes through — it IS
    * comparable (greatest), matching Spark. */
  def normD(d: Double): Double = d + 0.0
}

/** Planning-time file skipping for [[VersionedTable]] driven by ordinary
  * Catalyst predicates — the Delta/Iceberg integration shape: instead of
  * the caller naming ranges/keys through `readWhere`/`readKeys`, the
  * table is exposed through a custom [[FileIndex]] and Catalyst hands the
  * scan's data filters to [[listFiles]] during physical planning. A plain
  * `table.filter($"id" === 42).count()` — or `$"doc_id" === "d-123"`,
  * `$"ts" >= timestamp'…'`, `$"score" > 0.98`, `$"doc_id".startsWith(
  * "D00")` — then opens only the files whose manifest ranges (long OR
  * typed channel) intersect AND whose bloom sidecars admit the key —
  * visible in the plan's `numFiles` metric, with the vectorized parquet
  * reader, row-group pushdown and column pruning all intact (this index
  * slots into the standard `HadoopFsRelation`, it does not replace the
  * reader).
  *
  * Pruning is sound-by-construction: every literal routes to the domain
  * its column's manifest channel recorded (a literal the domain cannot
  * interpret never prunes), strict long comparisons tighten by one with
  * overflow guards, strict double bounds tighten by one ULP, strict
  * string bounds degrade to inclusive (sound, marginally less sharp),
  * prefix predicates compare the file range truncated to the prefix
  * length (exact, no fake upper bound), and bloom-uncovered files always
  * survive — safety over sharpness, same policy as `filesForRanges`.
  *
  * The bloom probe runs as a (tiny) distributed job during planning —
  * sidecar rows ∝ files, only (file, verdict) booleans collect — the
  * same per-FILE metadata trade the rest of the format makes. String
  * keys probe the sidecars [[VersionedTable]] builds under the hashed
  * scheme (xxhash64 of the value, sidecar column `#s:<name>`), hashed
  * here through Catalyst's own XxHash64 so build and probe can never
  * drift. */
final class VersionedFileIndex(
    spark: SparkSession,
    tablePath: String,
    relFiles: Seq[String],
    ranges: Map[(String, String), (Long, Long)],
    types: Map[String, String],
    typedRanges: Map[(String, String), (String, String)],
    bloomSidecars: Seq[String],
    statuses: Map[String, FileStatus])
  extends FileIndex {
  import StatBound._

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
    val prefixes = collectPrefixes(conjuncts)
    // a column whose conjuncts intersect to an empty interval can match
    // no row anywhere — zero files, regardless of per-file ranges
    val kept =
      if (bounds.exists { case (_, (lo, hi)) =>
          lo.zip(hi).exists { case (l, h) => cmp(l, h) > 0 } }) Seq.empty[String]
      else {
        val rangeKept = relFiles.filter { f =>
          bounds.forall { case (c, (lo, hi)) =>
            fileRange(f, c).forall { case (flo, fhi) =>
              lo.forall(cmp(fhi, _) >= 0) && hi.forall(cmp(flo, _) <= 0)
            }
          } &&
          prefixes.forall { case (c, p) =>
            fileRange(f, c).forall {
              // any p-prefixed value is ≥ p, and ≤-comparable by the
              // first |p| bytes: flo can precede one iff its |p|-byte
              // truncation is ≤ p (exact — no synthetic upper bound)
              case (S(flo), S(fhi)) =>
                java.util.Arrays.compareUnsigned(fhi, p) >= 0 &&
                  java.util.Arrays.compareUnsigned(
                    flo.take(p.length), p) <= 0
              case _ => true
            }
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

  /** The stats domain a column prunes in: its typed channel type when
    * recorded there, else the long channel. */
  private def domainOf(c: String): String = types.getOrElse(c, "long")

  /** Decode one manifest entry into the column's domain. */
  private def fileRange(f: String, c: String): Option[(StatBound, StatBound)] =
    types.get(c) match {
      case Some(t) => typedRanges.get((f, c)).map { case (lo, hi) => (dec(t, lo), dec(t, hi)) }
      case None => ranges.get((f, c)).map { case (lo, hi) => (L(lo), L(hi)) }
    }

  private def dec(t: String, raw: String): StatBound = t match {
    case "string" => S(raw.getBytes("UTF-8"))
    case "double" => D(normD(raw.toDouble))
    case "decimal" => C(new java.math.BigDecimal(raw))
    case _ => L(raw.toLong) // date = epoch days, timestamp = epoch micros
  }

  /** The column name a comparison side refers to, seeing through only the
    * casts whose pruning semantics stay exact: integral widening over a
    * long-domain column (the analyzer's implicit widening), and the
    * float→double widening over a double-domain column (every float is
    * exactly representable as double, and the 'F' stats are recorded over
    * the cast-to-double values). Any other cast declines to prune. */
  private def attrOf(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name)
    case c: Cast if integral(c.dataType) =>
      attrOf(c.child).filter(domainOf(_) == "long")
    case c: Cast if c.dataType == DoubleType && c.child.dataType == FloatType =>
      attrOf(c.child).filter(domainOf(_) == "double")
    case c: Cast =>
      // decimal→decimal WIDENING (scale and integral digits both
      // non-shrinking) is exact — the analyzer's promotion to the
      // comparison's common type; any lossy decimal cast declines
      (c.dataType, c.child.dataType) match {
        case (d2: DecimalType, d1: DecimalType)
            if d2.scale >= d1.scale &&
              d2.precision - d2.scale >= d1.precision - d1.scale =>
          attrOf(c.child).filter(domainOf(_) == "decimal")
        case _ => None
      }
    case _ => None
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** A literal interpreted in `c`'s domain; None never prunes. The
    * literal's own data type is checked, not just its runtime class — a
    * TIMESTAMP literal is a Long (micros) that must never meet the long
    * channel's epoch-second ranges. */
  private def litOf(c: String, e: Expression): Option[StatBound] =
    (domainOf(c), e) match {
      // null guards on the untyped patterns: a pushed-down `IN (1, NULL)`
      // carries Literal(null, IntegerType), which must decline to prune
      // (matching the typed patterns below, which reject null structurally)
      case ("long", Literal(v, dt)) if v != null && integral(dt) =>
        Some(L(v.asInstanceOf[Number].longValue))
      case ("string", Literal(u: UTF8String, StringType)) =>
        Some(S(u.getBytes))
      case ("date", Literal(days: Integer, DateType)) =>
        Some(L(days.longValue))
      case ("timestamp", Literal(micros: java.lang.Long, TimestampType)) =>
        Some(L(micros))
      case ("double", Literal(d: java.lang.Double, DoubleType)) =>
        Some(D(normD(d)))
      case ("double", Literal(f: java.lang.Float, FloatType)) =>
        Some(D(normD(f.doubleValue)))
      case ("double", Literal(v, dt)) if v != null && integral(dt) =>
        Some(D(v.asInstanceOf[Number].longValue.toDouble))
      case ("decimal",
          Literal(d: org.apache.spark.sql.types.Decimal, _: DecimalType)) =>
        Some(C(d.toJavaBigDecimal))
      case ("decimal", Literal(v, dt)) if v != null && integral(dt) =>
        Some(C(java.math.BigDecimal.valueOf(v.asInstanceOf[Number].longValue)))
      case _ => None
    }

  /** Strict `> v` tightened within the domain: +1 for longs (overflow →
    * canonical empty), one ULP for doubles, inclusive for strings (sound
    * — the exact filter still runs). None = unbounded on that side. */
  private type Iv = (Option[StatBound], Option[StatBound])
  private def above(b: StatBound): Iv = b match {
    case L(v) => if (v == Long.MaxValue) (Some(L(1)), Some(L(0))) else (Some(L(v + 1)), None)
    case D(v) => (Some(D(Math.nextUp(v))), None)
    case s: S => (Some(s), None)
    case c: C => (Some(c), None) // inclusive degrade: sound, exact filter still runs
  }

  private def below(b: StatBound): Iv = b match {
    case L(v) => if (v == Long.MinValue) (Some(L(1)), Some(L(0))) else (None, Some(L(v - 1)))
    case D(v) => (None, Some(D(Math.nextDown(v))))
    case s: S => (None, Some(s))
    case c: C => (None, Some(c))
  }

  /** col -> tightest [lo, hi] (inclusive, in the column's domain) implied
    * by the conjuncts; None = unbounded on that side. An unsatisfiable
    * strict long bound yields the canonical empty interval (1, 0). */
  private def collectBounds(conjuncts: Seq[Expression]): Map[String, Iv] = {
    def eq(l: Expression, r: Expression): Option[(String, Iv)] =
      attrOf(l).flatMap(c => litOf(c, r).map(v => c -> ((Some(v), Some(v)): Iv)))
    val perCol: Seq[(String, Iv)] = conjuncts.flatMap {
      case EqualTo(l, r) => eq(l, r).toSeq ++ eq(r, l).toSeq
      case EqualNullSafe(l, r) => eq(l, r).toSeq ++ eq(r, l).toSeq
      case GreaterThan(l, r) =>
        attrOf(l).flatMap(c => litOf(c, r).map(v => c -> above(v))).toSeq ++
          attrOf(r).flatMap(c => litOf(c, l).map(v => c -> below(v))).toSeq
      case GreaterThanOrEqual(l, r) =>
        attrOf(l).flatMap(c => litOf(c, r).map(v => c -> ((Some(v), None): Iv))).toSeq ++
          attrOf(r).flatMap(c => litOf(c, l).map(v => c -> ((None, Some(v)): Iv))).toSeq
      case LessThan(l, r) =>
        attrOf(l).flatMap(c => litOf(c, r).map(v => c -> below(v))).toSeq ++
          attrOf(r).flatMap(c => litOf(c, l).map(v => c -> above(v))).toSeq
      case LessThanOrEqual(l, r) =>
        attrOf(l).flatMap(c => litOf(c, r).map(v => c -> ((None, Some(v)): Iv))).toSeq ++
          attrOf(r).flatMap(c => litOf(c, l).map(v => c -> ((Some(v), None): Iv))).toSeq
      case In(a, vs) if vs.nonEmpty =>
        attrOf(a).flatMap { c =>
          val bs = vs.map(litOf(c, _))
          if (bs.exists(_.isEmpty)) None
          else {
            val all = bs.flatten
            val ord = Ordering.fromLessThan[StatBound](cmp(_, _) < 0)
            Some(c -> ((Some(all.min(ord)), Some(all.max(ord))): Iv))
          }
        }.toSeq
      case _ => Nil
    }
    val ord = Ordering.fromLessThan[StatBound](cmp(_, _) < 0)
    perCol.groupBy(_._1).map { case (c, bs) =>
      val los = bs.flatMap(_._2._1)
      val his = bs.flatMap(_._2._2)
      c -> ((if (los.isEmpty) None else Some(los.max(ord)),
        if (his.isEmpty) None else Some(his.min(ord))): Iv)
    }
  }

  /** STRING-domain prefix constraints (`startsWith`) — kept separate from
    * interval bounds because a prefix's exact upper bound is not a value
    * of the domain (it is "every string whose first |p| bytes are ≤ p"). */
  private def collectPrefixes(conjuncts: Seq[Expression]): Seq[(String, Array[Byte])] =
    conjuncts.flatMap {
      case StartsWith(l, Literal(p: UTF8String, StringType)) =>
        attrOf(l).filter(domainOf(_) == "string").map(c => c -> p.getBytes)
      case _ => Nil
    }

  /** Catalyst's own xxhash64 (seed 42) over a string literal — the probe
    * side of the hashed string bloom scheme; sharing the expression with
    * the sidecar builder makes drift impossible. */
  private def xx64(u: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(Literal(u, StringType)), 42L).eval(InternalRow.empty).asInstanceOf[Long]

  /** sidecar-column-name -> the exact key set a point predicate admits
    * (for bloom probes; only = and IN produce one). Long-domain columns
    * probe under their own name with raw keys; string-domain columns
    * probe under `#s:<name>` with xxhash64 keys. */
  private def collectPointKeys(conjuncts: Seq[Expression]): Map[String, Array[Long]] = {
    val perCol = conjuncts.flatMap {
      case EqualTo(l, r) =>
        pointOf(l, r).toSeq ++ pointOf(r, l).toSeq
      case In(a, vs) if vs.nonEmpty =>
        attrOf(a).flatMap { c =>
          val ks = vs.map(v => pointKey(c, v))
          if (ks.exists(_.isEmpty)) None
          else Some(sidecarName(c) -> ks.flatten)
        }.toSeq
      case InSet(a, hset) if hset.nonEmpty =>
        attrOf(a).flatMap { c =>
          domainOf(c) match {
            case "long" if hset.forall(_.isInstanceOf[java.lang.Number]) =>
              Some(c -> hset.toSeq.map(_.asInstanceOf[java.lang.Number].longValue))
            case "string" if hset.forall(_.isInstanceOf[UTF8String]) =>
              Some(sidecarName(c) ->
                hset.toSeq.map(v => xx64(v.asInstanceOf[UTF8String])))
            case _ => None
          }
        }.toSeq
      case _ => Nil
    }
    // several point conjuncts on one column intersect; keep the smallest
    // set — any key the file must contain suffices for a sound probe
    perCol.groupBy(_._1).map { case (c, ks) =>
      c -> ks.map(_._2).minBy(_.size).toArray
    }
  }

  private def sidecarName(c: String): String =
    if (domainOf(c) == "string") s"#s:$c" else c

  private def pointOf(l: Expression, r: Expression): Option[(String, Seq[Long])] =
    attrOf(l).flatMap(c => pointKey(c, r).map(k => sidecarName(c) -> Seq(k)))

  private def pointKey(c: String, e: Expression): Option[Long] =
    (domainOf(c), e) match {
      case ("long", Literal(v, dt)) if v != null && integral(dt) =>
        Some(v.asInstanceOf[Number].longValue)
      case ("string", Literal(u: UTF8String, StringType)) => Some(xx64(u))
      case _ => None
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
