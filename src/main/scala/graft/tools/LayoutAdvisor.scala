package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Layout-feedback loop (VERDICT r9 item 7): observe the WORKLOAD's
  * filter predicates and recommend the physical-layout levers the engine
  * already ships — manifest range stats ([[graft.io.VersionedTable]]
  * `statsCols`), bloom sidecars ([[graft.io.FileBloom]]), and Z-order
  * clustering ([[graft.io.Sinks.zOrderedParquet]]). Report ONLY — no
  * auto-rewrite: layout changes rewrite 100 TB of files, so the advisor
  * emits the evidence and a human (or an explicit maintenance job) pulls
  * the trigger.
  *
  * Observation is a plan walk, not instrumentation: each recorded query's
  * OPTIMIZED plan is scanned for Filter-over-scan shapes (attribute-only
  * Projects in between, same stripping discipline as
  * [[graft.plans.MvRewriteRule]]); every conjunct comparing ONE scan
  * column against foldable values counts one observation, classified
  * `eq` (=, <=>, IN — the shapes bloom sidecars answer) or `range`
  * (<, <=, >, >= — the shapes min/max stats answer). Columns co-filtered
  * in the SAME query are co-occurrence pairs, the signal that a single
  * sort column cannot serve the workload and Z-order can.
  *
  * Recommendation policy (deterministic, spec-pinned):
  *   - `statsCols`: long-castable columns (numeric/date/timestamp — the
  *     domain [[graft.io.VersionedTable]] records ranges for), ranked by
  *     total observations, ≥ `minShare` of the table's observations;
  *   - `bloomCols`: columns whose observations are ≥ half point lookups
  *     (any type — blooms hash), same share gate;
  *   - `zOrderCols`: the top 2–3 stats-eligible columns IF at least two
  *     of them co-occur in some query — otherwise a plain sort on the
  *     single hot column wins and Z-order's interleaving only dilutes it.
  *
  * Pair with [[PlanMetrics]] to MEASURE the before/after (filesRead is
  * the number these levers move); the advisor ranks, the metrics prove. */
object LayoutAdvisor {

  final case class ColStats(eq: Long, range: Long) {
    def total: Long = eq + range
    def +(o: ColStats): ColStats = ColStats(eq + o.eq, range + o.range)
  }

  /** (table root, column) -> counts; (table root, sorted col pair) -> co-occurrences. */
  private val byCol = TrieMap.empty[(String, String), ColStats]
  private val byPair = TrieMap.empty[(String, (String, String)), Long]
  private val colType = TrieMap.empty[(String, String), DataType]

  def clear(): Unit = {
    byCol.clear(); byPair.clear(); colType.clear()
    byJoin.clear(); rootSize.clear()
  }

  /** One query's filter observations: (table root, column, isEquality). */
  def observe(df: DataFrame): Seq[(String, String, Boolean)] = {
    val out = Seq.newBuilder[(String, String, Boolean)]
    df.queryExecution.optimizedPlan.foreach {
      case Filter(cond, child) =>
        tableOf(child).foreach { case (root, _) =>
          conjuncts(cond).foreach { c =>
            classify(c).foreach { case (attr, isEq) =>
              colType.put((root, attr.name), attr.dataType)
              out += ((root, attr.name, isEq))
            }
          }
        }
      case _ => ()
    }
    out.result()
  }

  /** Record a query into the session-level workload model. */
  def record(df: DataFrame): Unit = {
    val obs = observe(df)
    obs.foreach { case (root, colName, isEq) =>
      val d = if (isEq) ColStats(1, 0) else ColStats(0, 1)
      byCol.updateWith((root, colName)) {
        case Some(s) => Some(s + d)
        case None => Some(d)
      }
    }
    // co-occurrence: distinct column pairs filtered within this query
    obs.groupBy(_._1).foreach { case (root, rows) =>
      val cols = rows.map(_._2).distinct.sorted
      for (i <- cols.indices; j <- i + 1 until cols.size)
        byPair.updateWith((root, (cols(i), cols(j)))) {
          case Some(n) => Some(n + 1)
          case None => Some(1L)
        }
    }
  }

  final case class Recommendation(
      table: String,
      statsCols: Seq[String],
      bloomCols: Seq[String],
      zOrderCols: Seq[String],
      observations: Map[String, ColStats]) {
    def render: String = {
      val obs = observations.toSeq.sortBy(-_._2.total)
        .map { case (c, s) => s"$c(eq=${s.eq},range=${s.range})" }.mkString(" ")
      s"""table: $table
         |  observed: $obs
         |  recommend statsCols:  ${statsCols.mkString(", ")}
         |  recommend bloomCols:  ${bloomCols.mkString(", ")}
         |  recommend zOrderCols: ${if (zOrderCols.isEmpty) "(none — no co-filtered pair)" else zOrderCols.mkString(", ")}""".stripMargin
    }
  }

  /** Rank the recorded workload into per-table recommendations.
    * `minShare`: a column must carry at least this share of its table's
    * observations to be recommended (default 10% — one stray ad-hoc
    * filter should not earn a 100 TB re-layout). */
  def recommend(minShare: Double = 0.1, maxCols: Int = 4): Seq[Recommendation] = {
    byCol.keys.map(_._1).toSeq.distinct.sorted.map { root =>
      val cols = byCol.collect { case ((r, c), s) if r == root => c -> s }.toMap
      val tableTotal = cols.values.map(_.total).sum.max(1L)
      val hot = cols.toSeq
        .filter(_._2.total.toDouble / tableTotal >= minShare)
        .sortBy { case (c, s) => (-s.total, c) }
      def longCastable(c: String): Boolean = colType.get((root, c)).forall {
        case _: NumericType | DateType | TimestampType | TimestampNTZType => true
        case _ => false
      }
      val stats = hot.filter(h => longCastable(h._1)).take(maxCols).map(_._1)
      val bloom = hot.filter { case (_, s) => s.eq * 2 >= s.total }.take(maxCols).map(_._1)
      val zCandidates = stats.take(3)
      val coFiltered = zCandidates.combinations(2).exists {
        case Seq(a, b) =>
          val key = if (a < b) (a, b) else (b, a)
          byPair.getOrElse((root, key), 0L) > 0L
        case _ => false
      }
      val z = if (zCandidates.size >= 2 && coFiltered) zCandidates else Seq.empty
      Recommendation(root, stats, bloom, z, cols)
    }
  }

  /** The full report for logging/review. */
  def report(minShare: Double = 0.1): String =
    recommend(minShare).map(_.render).mkString("\n\n") match {
      case "" => "(no filter observations recorded)"
      case s => s
    }

  // ---- bucketing advisor (r13) ------------------------------------------
  //
  // The filter advisor above picks SKIPPING levers; this one picks the
  // SHUFFLE lever: repeated equi-joins between the same two big tables on
  // the same key are the workload shape [[graft.io.VersionedTable
  // .commitBucketed]] exists for — bucket both sides once and every such
  // join stops exchanging. Observation is the same optimized-plan walk
  // (Join nodes whose both sides strip to scans, attr=attr conjuncts with
  // one side from each scan); side sizes come from the relations' own
  // statistics, so the recommendation is metadata-only.

  /** (sorted root pair, "leftKey=rightKey") -> times observed. */
  private val byJoin = TrieMap.empty[((String, String), String), Long]
  private val rootSize = TrieMap.empty[String, Long]

  /** Record a query's equi-joins into the workload model. Returns the
    * observations for callers that want them. */
  def recordJoins(df: DataFrame): Seq[(String, String, String)] = {
    val out = Seq.newBuilder[(String, String, String)]
    df.queryExecution.optimizedPlan.foreach {
      case Join(l, r, Inner, Some(cond), _) =>
        for ((lroot, lrel) <- tableOf(l); (rroot, rrel) <- tableOf(r)) {
          rootSize.put(lroot, lrel.relation.sizeInBytes)
          rootSize.put(rroot, rrel.relation.sizeInBytes)
          // ALL equi-conjuncts of this join are ONE observation: a join
          // on (x AND y) co-locates through a layout hashed on the
          // composite tuple — recording x and y separately would
          // recommend two single-key layouts neither of which removes
          // this join's exchange ([[graft.io.VersionedTable]] hashes
          // int≠long per column and tuples as a whole, so the layout
          // must match the FULL key set)
          val pairs = conjuncts(cond).flatMap {
            case EqualTo(a: AttributeReference, b: AttributeReference) =>
              if (lrel.outputSet.contains(a) && rrel.outputSet.contains(b)) Some((a, b))
              else if (lrel.outputSet.contains(b) && rrel.outputSet.contains(a)) Some((b, a))
              else None
            case _ => None
          }
          if (pairs.nonEmpty) {
            // canonical order: lexicographic on the left-side names, so
            // the same composite join always records the same key string
            // (both writers must share one key ORDER — the rec names it)
            val sortedPairs = pairs.sortBy(_._1.name)
            val (roots, key) =
              if (lroot <= rroot)
                ((lroot, rroot), sortedPairs.map { case (x, y) => s"${x.name}=${y.name}" }.mkString(","))
              else
                ((rroot, lroot), sortedPairs.map { case (x, y) => s"${y.name}=${x.name}" }.mkString(","))
            byJoin.updateWith((roots, key)) {
              case Some(n) => Some(n + 1); case None => Some(1L)
            }
            out += ((roots._1, roots._2, key))
          }
        }
      case _ => ()
    }
    out.result()
  }

  final case class BucketingRec(
      tableA: String, tableB: String, keys: String, timesSeen: Long,
      bytesA: Long, bytesB: Long, nBuckets: Int) {
    /** What ONE such join stops shuffling once both sides are bucketed:
      * both inputs crossed the wire before, neither does after. */
    def shuffleBytesSavedPerQuery: Long = bytesA + bytesB
    def render: String =
      f"bucket both on [$keys] into $nBuckets: $tableA%s (${bytesA}B) ⋈ $tableB%s " +
        f"(${bytesB}B), seen $timesSeen×, ~${shuffleBytesSavedPerQuery}B shuffle saved/query"
  }

  /** Recommend bucket layouts: join pairs seen ≥ `minTimes` where BOTH
    * sides exceed `minSideBytes` (below that, broadcasting the small side
    * is strictly better than re-laying out either — say so by omission).
    * `nBuckets` sizes buckets at ~`targetBucketBytes` of the LARGER side,
    * rounded up to a power of two, floor 8 — a stable explicit number
    * both writers must share. */
  def recommendBucketing(
      minTimes: Long = 2,
      minSideBytes: Long = 10L * 1024 * 1024,
      targetBucketBytes: Long = 256L * 1024 * 1024): Seq[BucketingRec] =
    byJoin.toSeq.collect {
      case (((a, b), keys), n)
          if n >= minTimes &&
            rootSize.getOrElse(a, 0L) > minSideBytes &&
            rootSize.getOrElse(b, 0L) > minSideBytes =>
        val big = math.max(rootSize(a), rootSize(b))
        val raw = math.max(8L, (big + targetBucketBytes - 1) / targetBucketBytes)
        val pow2 = Integer.highestOneBit(raw.min(Int.MaxValue >> 1).toInt) match {
          case h if h.toLong == raw => h
          case h => h << 1
        }
        BucketingRec(a, b, keys, n, rootSize(a), rootSize(b), pow2)
    }.sortBy(r => (-r.timesSeen * r.shuffleBytesSavedPerQuery, r.tableA))

  // ---- plan walking ----------------------------------------------------

  @scala.annotation.tailrec
  private def tableOf(p: LogicalPlan): Option[(String, LogicalRelation)] = p match {
    case Project(es, child) if es.forall(_.isInstanceOf[AttributeReference]) =>
      tableOf(child)
    case Filter(_, child) => tableOf(child) // stacked filters observe per-Filter
    case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      // a multi-root scan (spark.read.parquet(dirA, dirB)) is ONE table
      // identity — keying on the full sorted root set keeps its
      // observations from being mis-attributed to an arbitrary first dir
      Some((fs.location.rootPaths.map(_.toString).sorted.mkString(","), lr))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** One conjunct -> (attribute, isEquality) when it compares a single
    * column against foldable values; None otherwise (IsNotNull noise,
    * column-to-column predicates, complex expressions). */
  private def classify(e: Expression): Option[(AttributeReference, Boolean)] = e match {
    case EqualTo(a: AttributeReference, v) if v.foldable => Some((a, true))
    case EqualTo(v, a: AttributeReference) if v.foldable => Some((a, true))
    case EqualNullSafe(a: AttributeReference, v) if v.foldable => Some((a, true))
    case EqualNullSafe(v, a: AttributeReference) if v.foldable => Some((a, true))
    case In(a: AttributeReference, vs) if vs.forall(_.foldable) => Some((a, true))
    case InSet(a: AttributeReference, _) => Some((a, true))
    case GreaterThan(a: AttributeReference, v) if v.foldable => Some((a, false))
    case GreaterThan(v, a: AttributeReference) if v.foldable => Some((a, false))
    case GreaterThanOrEqual(a: AttributeReference, v) if v.foldable => Some((a, false))
    case GreaterThanOrEqual(v, a: AttributeReference) if v.foldable => Some((a, false))
    case LessThan(a: AttributeReference, v) if v.foldable => Some((a, false))
    case LessThan(v, a: AttributeReference) if v.foldable => Some((a, false))
    case LessThanOrEqual(a: AttributeReference, v) if v.foldable => Some((a, false))
    case LessThanOrEqual(v, a: AttributeReference) if v.foldable => Some((a, false))
    case _ => None
  }
}
