package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.{Ann, ConnectedComponents, Dedup}

/** Incremental corpus refresh — the LLM-pipeline's OPERATIONAL story at
  * 100 TB, driven end-to-end: new documents land in the versioned corpus
  * table; the table's change feed hands exactly the window's additions to
  * the incremental MinHash ledger; near-dup survivors append their
  * embeddings to the IVF index. Nothing re-reads the resident corpus:
  *
  *   - the CDC read ([[VersionedTable.changes]]) opens ONLY the files the
  *     window's commits added — cost ∝ increment, manifest-driven;
  *   - [[Dedup.ingestIncrement]] shingles/signs ONLY the batch and joins
  *     it against the persisted band ledger on the band key — one keyed
  *     shuffle, resident docs are never re-signed;
  *   - the keep/drop closure runs connected components over the
  *     increment's OWN pair set (pairs all involve a new doc by
  *     construction, so edges ∝ increment, not corpus);
  *   - [[Ann.appendToIvfIndex]] assigns survivors to the FROZEN centroids
  *     and appends — the write touches only the cells the batch lands in.
  *
  * Keep rule, aligned with the one-shot [[CorpusPipeline]] semantics: a
  * new doc that (transitively, within the increment) near-dups a RESIDENT
  * doc is dropped entirely — the resident survivor already represents the
  * content; a within-increment dup group with no resident anchor keeps
  * its lowest doc_id. Deletions cannot cross this path: an append-only
  * ledger cannot unlearn a signature, so a window containing a
  * delete/merge commit REFUSES by name ([[VersionedTable.changes]]'s
  * append-only contract) — rebootstrap the ledger after an erasure pass
  * instead of silently suppressing future docs against ghosts. */
object CorpusRefresh {

  /** One refresh's accounting. `toVersion` is the next refresh's
    * `fromVersion` — the caller persists it (a real deployment keeps it
    * next to the ledger). `ivfSkew` is measured AFTER any auto-rebuild,
    * so it is the skew the next query actually sees. */
  final case class RefreshReport(
      fromVersion: Long, toVersion: Long,
      newDocs: Long, droppedQuality: Long, nearDupPairs: Long,
      droppedAnchoredToResident: Long, droppedWithinIncrement: Long,
      survivors: Long, vectorsAppended: Long, ivfSkew: Option[Double],
      ivfRebuilt: Boolean)

  /** Process everything the corpus table gained in
    * `(fromVersion, latest]` — or the full snapshot when `fromVersion`
    * is None (bootstrap). Returns the report plus the SURVIVOR frame
    * (new docs that enter the training corpus), already materialized.
    *
    * @param embeddings (id, vector) rows covering at least the new docs
    *                   (any vector column type [[Ann.prepared]] accepts);
    *                   required when `ivfPath` is set — survivors' rows
    *                   are selected by id and appended. Bootstraps the
    *                   index (k-means build) when no centroids exist yet.
    * @param minQuality quality gate BEFORE the ledger: docs scoring below
    *                   ([[graft.functions.TextFunctions.qualityScore]],
    *                   row-local) never sign — they are not corpus
    *                   members, so letting them suppress future docs as
    *                   ledger ghosts would be wrong, not just wasteful.
    *                   Same stage order as the one-shot [[CorpusPipeline]]
    *                   (quality → dedup).
    * @param ivfRebuildSkew drift remedy threshold: when the post-append
    *                   max/mean cell ratio reaches it, re-k-means the
    *                   index in place ([[Ann.rebuildIvfIndex]]) — the
    *                   monitored maintenance [[Ann.appendToIvfIndex]]'s
    *                   docs tell operators to schedule, folded into the
    *                   refresh so the increment path is self-healing.
    */
  def refresh(
      spark: SparkSession,
      tablePath: String,
      fromVersion: Option[Long],
      ledger: Dedup.DedupLedger,
      ivfPath: Option[String] = None,
      embeddings: Option[DataFrame] = None,
      embIdCol: String = "vec_id", embVecCol: String = "emb",
      textCol: String = "text", idCol: String = "doc_id",
      minJaccard: Double = 0.8,
      shingleSize: Int = 3, numPerm: Int = 32, bands: Int = 8,
      ivfNlist: Int = 16,
      minQuality: Option[Double] = None,
      ivfRebuildSkew: Option[Double] = None): (RefreshReport, DataFrame) = {
    require(ivfPath.isEmpty || embeddings.nonEmpty,
      "an IVF path without embeddings has nothing to append — pass the " +
        "increment's (id, vector) rows")
    val toVersion = VersionedTable.versions(spark, tablePath).last
    val changed = (fromVersion match {
      case Some(from) if from == toVersion =>
        // nothing landed since the last refresh: zero work, zero writes
        VersionedTable.read(spark, tablePath, Some(toVersion)).limit(0)
      case Some(from) => VersionedTable.changes(spark, tablePath, from, toVersion)
      case None => VersionedTable.read(spark, tablePath, Some(toVersion))
    }).localCheckpoint() // one materialization shared by gate/sign/report
    val nChanged = changed.count()
    // the quality gate runs BEFORE the ledger: a below-bar doc is not a
    // corpus member, so it must not sign (a ledger ghost would suppress
    // future near-dups of content the corpus never kept)
    val newDocs = minQuality match {
      case None => changed
      case Some(q) => changed.filter(
        graft.functions.TextFunctions.qualityScore(col(textCol)) >= q)
        .localCheckpoint()
    }
    val nNew = if (minQuality.isEmpty) nChanged else newDocs.count()
    val nQualityDropped = nChanged - nNew
    if (nNew == 0L) {
      val report = RefreshReport(fromVersion.getOrElse(toVersion), toVersion,
        nChanged, nQualityDropped, 0L, 0L, 0L, 0L, 0L, None, ivfRebuilt = false)
      return (report, newDocs.limit(0).select(col(idCol), col(textCol)))
    }
    // sign the batch, join the ledger, append the batch's signatures —
    // pairs all involve a new doc (all-old buckets were reported by the
    // increments that made them old)
    val pairs = Dedup.ingestIncrement(newDocs, ledger, textCol, idCol,
      shingleSize, numPerm, bands, minJaccard)
    val newIds = newDocs.select(col(idCol).as("id"))
    val tagged = pairs
      .join(newIds.withColumnRenamed("id", "a_id").withColumn("a_new", lit(true)),
        Seq("a_id"), "left")
      .join(newIds.withColumnRenamed("id", "b_id").withColumn("b_new", lit(true)),
        Seq("b_id"), "left")
      .na.fill(false, Seq("a_new", "b_new"))
      .localCheckpoint() // pair set ∝ increment; reused three times below
    val nPairs = tagged.count()
    // closure over the increment: components from within-new edges; a
    // new doc paired with a resident anchors its whole component out
    // (the resident survivor already represents the content). Docs whose
    // only pairs are resident-facing still need a component id — a
    // self-loop registers the node without adding connectivity.
    val newEdges = tagged.filter(col("a_new") && col("b_new")).select("a_id", "b_id")
      .unionByName(tagged.filter(col("a_new") && !col("b_new"))
        .select(col("a_id"), col("a_id").as("b_id")))
      .unionByName(tagged.filter(col("b_new") && !col("a_new"))
        .select(col("b_id").as("a_id"), col("b_id")))
    // comps feeds three actions (anchored count, dropped build,
    // survivors anti-join) — materialize once so the label loop never
    // replays; the frame is dup-groups-sized
    val (comps0, _) = ConnectedComponents.label(newEdges)
    val comps = comps0.localCheckpoint()
    val anchoredIds = tagged.filter(col("a_new") =!= col("b_new"))
      .select(when(col("a_new"), col("a_id")).otherwise(col("b_id")).as("id"))
      .distinct()
    val anchoredComps = comps.join(anchoredIds, comps("id") === anchoredIds("id"))
      .select(comps("comp")).distinct()
    val dropped = comps
      .join(broadcastIfSmall(anchoredComps), Seq("comp"), "left_semi")
      .select(col("id"))
      .unionByName(
        // unanchored components keep their lowest id: everything else drops
        comps.join(anchoredComps, Seq("comp"), "left_anti")
          .groupBy("comp").agg(min(col("id")).as("keep"),
            collect_set(col("id")).as("ids"))
          .select(explode(col("ids")).as("id"), col("keep"))
          .filter(col("id") =!= col("keep"))
          .select("id"))
      .distinct()
      .localCheckpoint()
    val nAnchored = comps.join(anchoredComps, Seq("comp"), "left_semi").count()
    val nWithin = dropped.count() - nAnchored
    val survivors = newDocs
      .join(dropped.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      .localCheckpoint()
    val nSurvivors = survivors.count()
    // survivors' vectors append to the frozen-centroid index (bootstrap
    // builds it); health rides back so the caller sees drift, and the
    // optional skew threshold makes the remedy part of the loop
    val (nVecs, skew, rebuilt) = ivfPath match {
      case None => (0L, None, false)
      case Some(path) =>
        val vecs = Ann.prepared(embeddings.get, embVecCol, embIdCol)
          .join(survivors.select(col(idCol).as("vec_id")), Seq("vec_id"))
        val hasCentroids =
          try { spark.read.parquet(s"$path/centroids").limit(1).count() > 0 }
          catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition != null && e.getCondition.contains("PATH_NOT_FOUND") =>
              false
          }
        val n =
          if (hasCentroids) Ann.appendToIvfIndex(spark, path, vecs)
          else {
            Ann.saveIvfIndex(Ann.buildIvfIndex(vecs, ivfNlist), path)
            vecs.count()
          }
        val health = Ann.cellSkew(spark, path)
        val doRebuild = ivfRebuildSkew.exists(health.needsRebuild)
        val finalSkew =
          if (doRebuild) Ann.rebuildIvfIndex(spark, path, ivfNlist).skew
          else health.skew
        (n, Some(finalSkew), doRebuild)
    }
    val report = RefreshReport(fromVersion.getOrElse(toVersion), toVersion,
      nChanged, nQualityDropped, nPairs, nAnchored, nWithin, nSurvivors,
      nVecs, skew, rebuilt)
    (report, survivors)
  }

  /** One rebootstrap's accounting: `toVersion` resets the consumer —
    * it is the next [[refresh]]'s `fromVersion`. */
  final case class RebootstrapReport(
      toVersion: Long, docsSigned: Long, droppedQuality: Long)

  /** LEDGER REBOOTSTRAP after an erasure pass (VERDICT r17 item 8) —
    * the operational right-to-be-forgotten closure: [[refresh]] refuses
    * a window containing a delete/merge commit because an append-only
    * ledger cannot unlearn a signature, and the documented remedy is
    * this call. It rebuilds the band ledger from the SURVIVING corpus
    * snapshot in one signing pass ([[Dedup.bootstrapLedger]] —
    * overwrite, so the erased docs' signatures are GONE and cannot
    * suppress future content as ghosts), applies the same quality gate
    * as [[refresh]] (a below-bar doc is not a corpus member and must
    * not sign), and returns the snapshot version as the next refresh's
    * `fromVersion`. The full erasure sequence is therefore
    * deleteWhere/purgeKeys → vacuum → rebootstrap; ledger content ==
    * a fresh bootstrap over the surviving corpus (spec-pinned). */
  def rebootstrap(
      spark: SparkSession,
      tablePath: String,
      ledger: Dedup.DedupLedger,
      textCol: String = "text", idCol: String = "doc_id",
      shingleSize: Int = 3, numPerm: Int = 32, bands: Int = 8,
      minQuality: Option[Double] = None): RebootstrapReport = {
    val toVersion = VersionedTable.versions(spark, tablePath).last
    val snapshot = VersionedTable.read(spark, tablePath, Some(toVersion))
    val total = snapshot.count()
    val kept = minQuality match {
      case None => snapshot
      case Some(q) => snapshot.filter(
        graft.functions.TextFunctions.qualityScore(col(textCol)) >= q)
    }
    val signed = Dedup.bootstrapLedger(
      kept, ledger, textCol, idCol, shingleSize, numPerm, bands)
    RebootstrapReport(toVersion, signed, total - signed)
  }

  /** The anchored-component set is dup-groups-sized — tiny after any
    * realistic blocking — but correctness must not depend on that, so
    * broadcast is a hint, not a collect. */
  private def broadcastIfSmall(df: DataFrame): DataFrame =
    org.apache.spark.sql.functions.broadcast(df)
}
