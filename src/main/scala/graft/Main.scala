package graft

import graft.core.GraftSession
import graft.io.Sinks
import graft.pipeline.PowerPipeline

/** Subcommand CLI (replaces the reference's edit-`Main`-between-runs wiring,
  * `/root/reference` `Main.scala:18`):
  *
  *   graft.Main pipeline <rawPowerCsv> <outCsv>   reference-parity pipeline
  *   graft.Main query <name> <sfDir>              run one declared query
  *   graft.Main list                              list declared queries
  */
object Main {
  def main(args: Array[String]): Unit = args.toList match {
    case "pipeline" :: raw :: out :: Nil =>
      implicit val spark = GraftSession.local()
      val prepared = PowerPipeline.castNumerics(
        PowerPipeline.addDateTime(
          PowerPipeline.replaceMissing(PowerPipeline.loadRaw(spark, raw))))
      prepared.cache()
      val stats = PowerPipeline.beforeStats(prepared)
      println(s"[graft] before-clean stats: $stats")
      val result = PowerPipeline.run(spark, raw)
      Sinks.singleFileCsv(result, out)
      println(s"[graft] wrote ${result.count()} hourly rows -> $out")
      spark.stop()
    case "query" :: name :: sfDir :: Nil =>
      val spark = GraftSession.local()
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).show(20, truncate = false)
        case None =>
          System.err.println(s"unknown query '$name'; try: graft.Main list")
          sys.exit(1)
      }
      spark.stop()
    case "explain" :: name :: sfDir :: Nil =>
      val spark = GraftSession.local()
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query '$name'"); sys.exit(1)
      }
      spark.stop()
    case "list" :: Nil =>
      SparkEntry.registry.foreach(q =>
        println(f"${q.name}%-28s oracle=${q.oracle.isDefined}%-5s headline=${q.headline}"))
    case "lineage" :: name :: sfDir :: Nil =>
      // column-level provenance: out_col <- table.column dependency edges
      val spark = GraftSession.local()
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          graft.tools.ColumnLineage.of(fn(spark, sfDir)).toSeq.sortBy(_._1).foreach {
            case (out, srcs) =>
              println(f"$out%-28s <- ${srcs.toSeq.sorted.mkString(", ")}")
          }
        case None => System.err.println(s"unknown query '$name'"); sys.exit(1)
      }
      spark.stop()
    // Impact analysis — invert column lineage over the WHOLE registry:
    // which queries (and which of their outputs) depend on a leaf
    // column. Driver-side plan walks only; `needle` matches the
    // "table.column" suffix (e.g. "lineitem.l_discount" or just
    // "l_discount").
    case "impact" :: needle :: sfDir :: Nil =>
      val spark = GraftSession.local()
      var hits = 0
      SparkEntry.registry.foreach { q =>
        try {
          val deps = graft.tools.ColumnLineage.of(q.run(spark, sfDir))
          val touched = deps.toSeq.collect {
            case (out, srcs) if srcs.exists(s => s == needle || s.endsWith(s".$needle")) => out
          }.sorted
          if (touched.nonEmpty) {
            hits += 1
            println(f"${q.name}%-30s <- ${touched.mkString(", ")}")
          }
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      println(s"[graft] $hits queries depend on '$needle'")
      spark.stop()
    case "metrics" :: name :: sfDir :: Nil =>
      val spark = GraftSession.local()
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val summary = graft.tools.PlanMetrics.run(fn(spark, sfDir))
          println(graft.tools.PlanMetrics.render(summary))
        case None => System.err.println(s"unknown query '$name'"); sys.exit(1)
      }
      spark.stop()
    // Versioned-table ops surface (the maintenance commands a table owner
    // schedules: audit trail, small-file compaction, retention vacuum).
    case "table-history" :: path :: Nil =>
      val spark = GraftSession.local()
      graft.io.VersionedTable.history(spark, path).foreach { v =>
        val writers = if (v.writers.isEmpty) "" else v.writers.mkString(" writers=[", ",", "]")
        println(f"v${v.version}%-4d ${v.operation}%-14s parent=${v.parent}%-4d files=${v.nFiles}%-5d$writers")
      }
      spark.stop()
    case "table-compact" :: path :: target :: Nil =>
      val spark = GraftSession.local()
      val (v, rewritten) = graft.io.VersionedTable.compact(spark, path, target.toLong)
      println(s"[graft] compacted $rewritten files -> version $v")
      spark.stop()
    case "table-vacuum-dry" :: path :: keepLast :: Nil =>
      // what vacuum WOULD remove — run before the irreversible step
      val spark = GraftSession.local()
      val (vs, files, bytes) =
        graft.io.VersionedTable.vacuumDryRun(spark, path, keepLast.toInt)
      println(s"[graft] would drop ${vs.size} versions (${vs.mkString(",")}), " +
        s"${files.size} files, $bytes bytes")
      spark.stop()
    case "table-vacuum" :: path :: keepLast :: Nil =>
      val spark = GraftSession.local()
      val (manifests, files) = graft.io.VersionedTable.vacuum(spark, path, keepLast.toInt)
      println(s"[graft] vacuumed $manifests versions, $files data files")
      spark.stop()
    // Workload advisors: replay the headline queries over a fixture dir,
    // record their filter AND aggregate shapes, and print both the
    // stats/bloom/Z-order layout report and the materialized-view
    // recommendations (report only — no table is touched).
    case "advise" :: sfDir :: Nil =>
      val spark = GraftSession.local()
      graft.tools.LayoutAdvisor.clear()
      graft.tools.MvAdvisor.clear()
      SparkEntry.registry.filter(_.headline).foreach { q =>
        try {
          val df = q.run(spark, sfDir)
          graft.tools.LayoutAdvisor.record(df)
          graft.tools.MvAdvisor.record(df)
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      println("== layout ==")
      println(graft.tools.LayoutAdvisor.report())
      println("\n== materialized views ==")
      println(graft.tools.MvAdvisor.report())
      graft.tools.LayoutAdvisor.clear()
      graft.tools.MvAdvisor.clear()
      spark.stop()
    // Advisor MEASUREMENT loop: stage the events fixture as an unclustered
    // versioned table, replay a hot-filter + rollup workload, apply the top
    // layout recommendation and materialize the top view, and print the
    // per-query PlanMetrics before/after deltas (filesRead is the number
    // the layout levers move). Scratch dir holds the re-laid-out copy and
    // the view state.
    case "advise-measure" :: sfDir :: scratch :: rest if rest.size <= 1 =>
      val spark = GraftSession.local()
      import org.apache.spark.sql.functions.{col, sum}
      val tbl = s"$scratch/events_tbl"
      graft.io.VersionedTable.commitAppend(
        graft.core.Tables.events(spark, sfDir).repartition(16), tbl)
      def t(p: String) = graft.io.VersionedTable.table(spark, p)
      val workload: graft.tools.AdvisorLoop.Workload = Seq(
        "user_point" -> (p => t(p).filter(col("user_id") === 777L)),
        "user_range" -> (p => t(p).filter(col("user_id").between(1000L, 2000L))),
        "type_rollup" -> (p => t(p).groupBy("event_type").agg(sum("value").as("total"))))
      val report = graft.tools.AdvisorLoop.measure(spark, tbl, scratch, workload)
      println(report.render)
      // optional 4th arg: write the machine-readable artifact a workload
      // CI diffs round-over-round (recommendations + measured deltas)
      rest.headOption.foreach { out =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out), report.toJson)
        println(s"[graft] wrote $out")
      }
      spark.stop()
    case "table-lookup" :: path :: keyCol :: keys :: Nil =>
      // point lookup through the bloom-sidecar path (readKeys): the
      // subject-access primitive — show every retained row for a key set
      // opening only the files whose blooms admit the keys
      val spark = GraftSession.local()
      val ids = keys.split(",").toSeq.map(_.trim.toLong).toArray
      graft.io.VersionedTable.readKeys(spark, path, keyCol, ids)
        .show(1000, truncate = false)
      spark.stop()
    case "table-tag" :: path :: name :: rest if rest.size <= 1 =>
      // pin a release name to a version (default: latest); tagged
      // versions survive table-vacuum until the tag is deleted
      val spark = GraftSession.local()
      val v = graft.io.VersionedTable.setTag(
        spark, path, name, rest.headOption.map(_.toLong), overwrite = true)
      println(s"[graft] tag '$name' -> v$v")
      spark.stop()
    case "table-depth" :: path :: column :: Nil =>
      // clustering-depth diagnostic from manifest ranges alone: decide
      // whether OPTIMIZE ZORDER is worth a rewrite WITHOUT scanning
      val spark = GraftSession.local()
      val (files, avg, maxD) =
        graft.io.VersionedTable.clusteringDepth(spark, path, column)
      println(f"[graft] $column: $files files, avg overlaps/file $avg%.2f, max depth $maxD" +
        (if (avg > 1.0) "  -> consider OPTIMIZE ... ZORDER" else "  (well clustered)"))
      spark.stop()
    case "table-tags" :: path :: Nil =>
      val spark = GraftSession.local()
      graft.io.VersionedTable.tags(spark, path).toSeq.sortBy(_._1).foreach {
        case (n, v) => println(f"$n%-24s v$v")
      }
      spark.stop()
    case "table-delete" :: path :: keyCol :: keys :: Nil =>
      // surgical purge by key list; follow with table-vacuum for the
      // physical erasure (pre-delete snapshots time-travel until then)
      val spark = GraftSession.local()
      val ids = keys.split(",").toSeq.map(_.trim.toLong)
      val (v, deleted) = graft.io.VersionedTable.deleteWhere(
        spark, path, org.apache.spark.sql.functions.col(keyCol).isin(ids: _*))
      println(s"[graft] deleted $deleted rows -> version $v")
      spark.stop()
    case "table-purge" :: path :: keyCol :: keys :: Nil =>
      // erasure across ALL retained versions (right to be forgotten):
      // rewrites every affected data/CDF/DV file and edits the manifests
      // in place — unlike table-delete, pre-purge snapshots no longer
      // serve the subject. Run in a maintenance window.
      val spark = GraftSession.local()
      val ids = keys.split(",").toSeq.map(_.trim.toLong)
      val r = graft.io.VersionedTable.purgeKeys(spark, path, keyCol, ids)
      println(s"[graft] purged ${r.rowsPurged} rows: " +
        s"${r.dataFilesRewritten} data + ${r.cdfFilesRewritten} cdf + " +
        s"${r.dvFilesRewritten} dv files rewritten, ${r.versionsEdited} manifests edited")
      spark.stop()
    case "sql" :: stmt :: rest if rest.size <= 1 =>
      // run SQL statements (incl. the VtSqlParser maintenance surface:
      // DESCRIBE HISTORY / SHOW TAGS / VACUUM / OPTIMIZE / ANALYZE); an
      // optional second arg registers the fixture tables first so plain
      // SELECTs over region/nation/.../documents work too. Multiple
      // statements split on ';' run in ONE session — SET a catalog conf,
      // CREATE, INSERT, SELECT in a single invocation. The split is
      // quote-aware: ';' inside a single-quoted literal (SQL's ''
      // escape included) or a double-quoted identifier stays put, so
      // `... LIKE '%;%'` is ONE statement, not two broken fragments.
      val spark = GraftSession.local()
      rest.headOption.foreach(sfDir => graft.core.Tables.registerFixtures(spark, sfDir))
      splitSqlStatements(stmt).foreach(s => spark.sql(s).show(100, truncate = false))
      spark.stop()
    case "table-verify" :: path :: Nil =>
      // offline integrity sweep: referenced-file existence, recorded
      // row counts, orphan census (exit 1 on corruption)
      val spark = GraftSession.local()
      val r = graft.io.VersionedTable.verifyIntegrity(spark, path)
      println(s"[graft] ${r.versions} versions, ${r.filesChecked} files checked, " +
        s"${r.missingFiles.size} missing, ${r.countMismatches.size} count mismatches, " +
        s"${r.orphanFiles} orphans${if (r.ok) " — OK" else " — CORRUPT"}")
      r.missingFiles.foreach(f => println(s"[graft]   missing: $f"))
      r.countMismatches.foreach { case (v, f, rec, act) =>
        println(s"[graft]   v$v $f: recorded $rec, actual $act")
      }
      spark.stop()
      if (!r.ok) sys.exit(1)
    case "experiment-report" :: "--subjects" :: subjPath :: rest
        if rest.isEmpty || rest == List("--arms") =>
      // the report on a CALLER-SUPPLIED subject frame — the operational
      // mode: read the parquet, refuse BY NAME if the chosen mode's
      // columns are missing, then run the same spec-pinned sections
      val spark = GraftSession.local()
      val arms = rest.nonEmpty
      val subjects = graft.tools.ExperimentReport.requireSubjectColumns(
        spark.read.parquet(subjPath), arms).cache()
      val secs =
        if (arms) graft.tools.ExperimentReport.multiArmSections(subjects)
        else graft.tools.ExperimentReport.sections(subjects)
      secs.foreach {
        case (title, body) =>
          println(s"== $title ==")
          try body().show(truncate = false)
          catch {
            case e: IllegalArgumentException =>
              println(s"[refused] ${e.getMessage}")
          }
      }
      spark.stop()
    case "experiment-report" :: sfDir :: "--arms" :: Nil =>
      // the same population read as a FOUR-arm experiment (iid and
      // geo-randomized): every readout multiplicity-controlled; the
      // analysis lives in ExperimentReport.multiArmSections (spec-pinned)
      val spark = GraftSession.local()
      val subjects = graft.tools.ExperimentReport.subjects(spark, sfDir).cache()
      graft.tools.ExperimentReport.multiArmSections(subjects).foreach {
        case (title, body) =>
          println(s"== $title ==")
          try body().show(truncate = false)
          catch {
            case e: IllegalArgumentException =>
              println(s"[refused] ${e.getMessage}")
          }
      }
      spark.stop()
    case "experiment-report" :: sfDir :: Nil =>
      // the full A/B readout pipeline in the order a platform runs it —
      // the analysis lives in graft.tools.ExperimentReport (spec-pinned
      // against the underlying operators); this case only formats.
      // A section's REFUSAL is its honest answer (e.g. degenerate
      // subgroups at tiny SF) — print the diagnosis, keep reporting.
      val spark = GraftSession.local()
      val subjects = graft.tools.ExperimentReport.subjects(spark, sfDir).cache()
      graft.tools.ExperimentReport.sections(subjects).foreach {
        case (title, body) =>
          println(s"== $title ==")
          try body().show(truncate = false)
          catch {
            case e: IllegalArgumentException =>
              println(s"[refused] ${e.getMessage}")
          }
      }
      spark.stop()
    case "corpus-refresh" :: table :: ledgerDir :: "--rebootstrap" :: Nil =>
      // right-to-be-forgotten closure: after deleteWhere/purge + vacuum,
      // rebuild the band ledger from the surviving snapshot (one signing
      // pass, overwrite) and reset the consumer version — the erased
      // docs' signatures must not keep suppressing future content
      val spark = GraftSession.local()
      val ledger = graft.ops.Dedup.DedupLedger(
        s"$ledgerDir/bands", s"$ledgerDir/sketches")
      val r = graft.pipeline.CorpusRefresh.rebootstrap(spark, table, ledger)
      println(s"[graft] corpus-refresh rebootstrap: ${r.docsSigned} docs signed " +
        s"(${r.droppedQuality} quality-dropped), ledger reset at $ledgerDir; " +
        s"next fromVersion = ${r.toVersion}")
      spark.stop()
    case "corpus-refresh" :: table :: ledgerDir :: rest if rest.size <= 3 =>
      // the incremental corpus-refresh capstone as an operational
      // command: process everything the corpus table gained since
      // <fromVersion> (omit for the bootstrap pass) through the MinHash
      // ledger at <ledgerDir>, optionally appending survivors' vectors
      // (parquet with vec_id/embedding) to the IVF index at <ivfDir>.
      // Prints the report; the printed to_version is the next run's
      // fromVersion.
      val spark = GraftSession.local()
      // fromVersion "none" = bootstrap (needed to reach the embeddings
      // positions on the first run)
      val from = rest.headOption.filter(_ != "none").map(_.toLong)
      val (embDf, ivf) = rest.drop(1) match {
        case embPath :: ivfDir :: Nil =>
          (Some(spark.read.parquet(embPath)), Some(ivfDir))
        case Nil => (None, None)
        case bad => sys.error(s"embeddings parquet and ivf dir go together, got $bad")
      }
      val ledger = graft.ops.Dedup.DedupLedger(
        s"$ledgerDir/bands", s"$ledgerDir/sketches")
      val (r, _) = graft.pipeline.CorpusRefresh.refresh(
        spark, table, from, ledger, ivfPath = ivf, embeddings = embDf,
        embVecCol = "embedding")
      println(s"[graft] corpus-refresh ${r.fromVersion} -> ${r.toVersion}: " +
        s"${r.newDocs} new (${r.droppedQuality} quality-dropped), " +
        s"${r.nearDupPairs} near-dup pairs, " +
        s"${r.droppedAnchoredToResident} anchored + " +
        s"${r.droppedWithinIncrement} within-increment dropped, " +
        s"${r.survivors} survivors, ${r.vectorsAppended} vectors appended" +
        r.ivfSkew.map(s => f", ivf skew $s%.2f" +
          (if (r.ivfRebuilt) " (rebuilt)" else "")).getOrElse(""))
      spark.stop()
    case other =>
      System.err.println(
        "usage: pipeline <rawCsv> <outCsv> | query <name> <sfDir> | explain <name> <sfDir> | " +
          "list | sql <stmt> [sfDir] | metrics <name> <sfDir> | lineage <name> <sfDir> | advise <sfDir> | " +
          "experiment-report (<sfDir> | --subjects <parquet>) [--arms] | " +
          "corpus-refresh <tablePath> <ledgerDir> [--rebootstrap | fromVersion|none [embParquet ivfDir]] | " +
          "advise-measure <sfDir> <scratchDir> [jsonOut] | " +
          "table-history <path> | " +
          "table-compact <path> <rowsPerFile> | table-vacuum <path> <keepLast> | " +
          "table-depth <path> <column> | " +
          "table-delete <path> <keyCol> <id,...> | " +
          "table-purge <path> <keyCol> <id,...> | " +
          s"table-verify <path> (got: $other)")
      sys.exit(1)
  }

  /** ';'-split that respects SQL quoting: single-quoted literals (with
    * the standard '' escape — a doubled quote stays inside the literal)
    * and double-quoted identifiers. Backslashes are NOT escapes here
    * (matching ANSI SQL, and Spark's default `spark.sql.parser
    * .escapedStringLiterals=false` still ends the literal at an
    * unpaired quote for splitting purposes — a conservative reading
    * that only ever splits LESS than the old blind split). */
  private[graft] def splitSqlStatements(stmt: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var quote: Char = 0 // 0 = outside, '\'' or '"' = inside that quote
    while (i < stmt.length) {
      val ch = stmt.charAt(i)
      if (quote != 0) {
        cur += ch
        if (ch == quote) {
          // '' / "" inside a quoted region is an escaped quote, not a close
          if (i + 1 < stmt.length && stmt.charAt(i + 1) == quote) {
            cur += quote; i += 1
          } else quote = 0
        }
      } else ch match {
        case ';' => out += cur.result(); cur.clear()
        case '\'' | '"' => quote = ch; cur += ch
        case c => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
