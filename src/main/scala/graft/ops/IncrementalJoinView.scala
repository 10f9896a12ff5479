package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Incremental maintenance of a JOIN view — fact ⋈ dim, grouped and
  * aggregated — under change feeds from BOTH versioned sources: the
  * star-schema half of the IVM problem ([[IncrementalView]] covers the
  * single-table half).
  *
  * The refresh applies the classical delta rule in one pass. With signed
  * change multisets (insert +1, delete −1) and F_new = F_old + ΔF,
  * D_new = D_old + ΔD:
  *
  *   Δ(F ⋈ D) = ΔF ⋈ D_new + F_old ⋈ ΔD
  *
  * (the ΔF⋈ΔD cross term lands exactly once, inside the first product).
  * Both products are delta-driven: ΔF joins the dim at its LATEST
  * version (dims are small or prunable by the delta's keys), and ΔD
  * joins the fact AT ITS OLD VERSION — at scale the expensive side, so
  * [[factForDimDelta]] prunes it by the delta's key set: bloom/manifest
  * file skipping via [[VersionedTable.readKeys]] when the fk is
  * integral, a broadcast semi-join otherwise. Refresh cost is therefore
  * ∝ change volume and the fact FILES holding changed dim keys, never
  * the full join.
  *
  * A dim-attribute UPDATE that migrates rows between groups needs no
  * special case: the update's tombstone (−1, old attributes) decrements
  * the old group while its insert (+1, new attributes) increments the
  * new one, through the same signed arithmetic.
  *
  * Aggregates are the invertible family (COUNT, SUM, AVG = sum/cnt) —
  * view schema: groupCols ++ cnt ++ sum_<c>. Groups whose count reaches
  * zero delete from the view. Commits ride
  * [[VersionedTable.mergeBatch]]'s txn gate keyed on BOTH source
  * watermarks packed into one batch id, so a crashed consumer replaying
  * its window is a no-op; windows the CDF cannot express (overwrite /
  * vacuumed-past watermark on either source) heal via a full recompute,
  * exactly like [[IncrementalView]].
  */
object IncrementalJoinView {

  /** The maintained join: `fact.fk == dim.dimKey`, grouped by
    * `groupCols` (from either side post-join), summing `sumCols`. */
  final case class Spec(
      factPath: String, dimPath: String, fk: String, dimKey: String,
      groupCols: Seq[String], sumCols: Seq[String]) {
    require(groupCols.nonEmpty, "need at least one group column")
  }

  private val Radix = 1000000L // dim watermark packs into batchId mod this

  private def enc(fv: Long, dv: Long): Long = {
    require(dv < Radix && fv < Radix, s"version out of packing range: $fv/$dv")
    fv * Radix + dv
  }
  private def dec(b: Long): (Long, Long) = (b / Radix, b % Radix)

  /** Applied (factVersion, dimVersion) watermarks, None before bootstrap. */
  def watermarks(spark: SparkSession, viewPath: String, consumerId: String): Option[(Long, Long)] =
    VersionedTable.lastCommittedBatch(spark, viewPath, consumerId).map(dec)

  private def joined(fact: DataFrame, dim: DataFrame, spec: Spec): DataFrame =
    fact.join(dim, fact(spec.fk) === dim(spec.dimKey))

  /** A delta touching more distinct dim keys than this reads the old fact
    * in full — when most of the dim changed, one sequential pass beats
    * per-key bloom probes. */
  private val MaxDeltaKeys = 10000

  /** `F_old` for the ΔD-side product, pruned by the delta's key set. At
    * 100 TB the old-fact read is the refresh's expensive side: a ten-row
    * dim update must not cost a full fact scan. Integral fks ride
    * [[VersionedTable.readKeys]] — bloom-sidecar/manifest file skipping
    * plus a broadcast semi-join, so I/O ∝ files holding the changed keys;
    * non-integral fks get the broadcast semi-join alone (row pruning
    * without file skipping). Deltas wider than [[MaxDeltaKeys]] fall back
    * to the unpruned read. Dropping fact rows whose fk is outside the
    * key set is exact: the t2 product equi-joins on those very keys. */
  private[graft] def factForDimDelta(
      spark: SparkSession, spec: Spec, f0: Long, dD: DataFrame): DataFrame = {
    val keyRows = dD.select(col(spec.dimKey)).where(col(spec.dimKey).isNotNull)
      .distinct().limit(MaxDeltaKeys + 1).collect()
    def full = VersionedTable.read(spark, spec.factPath, Some(f0))
    if (keyRows.length > MaxDeltaKeys) return full
    if (keyRows.isEmpty) return full.where(lit(false)) // empty/all-null Δ keys join nothing
    val asLong: PartialFunction[Any, Long] = {
      case l: Long  => l
      case i: Int   => i.toLong
      case s: Short => s.toLong
      case b: Byte  => b.toLong
    }
    if (keyRows.forall(r => asLong.isDefinedAt(r.get(0))))
      VersionedTable.readKeys(
        spark, spec.factPath, spec.fk, keyRows.map(r => asLong(r.get(0))), Some(f0))
    else {
      val probes = dD.select(col(spec.dimKey).as("__probe_key"))
        .where(col("__probe_key").isNotNull).distinct()
      full.join(broadcast(probes), col(spec.fk) === col("__probe_key"), "left_semi")
    }
  }

  private def agged(df: DataFrame, spec: Spec): DataFrame =
    df.groupBy(spec.groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        spec.sumCols.map(c => sum(col(c).cast("double")).as(s"sum_$c")): _*)

  /** Bring the view to the sources' current versions. Returns the newly
    * applied (factVersion, dimVersion), or None if already current. */
  def refresh(
      spark: SparkSession, spec: Spec, viewPath: String, consumerId: String): Option[(Long, Long)] = {
    val fvNow = VersionedTable.versions(spark, spec.factPath).last
    val dvNow = VersionedTable.versions(spark, spec.dimPath).last
    def snapshotView: DataFrame =
      agged(joined(
        VersionedTable.read(spark, spec.factPath, Some(fvNow)),
        VersionedTable.read(spark, spec.dimPath, Some(dvNow)), spec), spec)
    def fullResync(): Option[(Long, Long)] =
      VersionedTable.commitOverwriteBatch(snapshotView, viewPath, consumerId, enc(fvNow, dvNow))
        .map(_ => (fvNow, dvNow))

    watermarks(spark, viewPath, consumerId) match {
      case None => fullResync() // bootstrap
      case Some((f0, d0)) if f0 == fvNow && d0 == dvNow => None
      case Some((f0, d0)) =>
        val windows =
          try Some((
            VersionedTable.changesWithType(spark, spec.factPath, f0, fvNow),
            VersionedTable.changesWithType(spark, spec.dimPath, d0, dvNow)))
          catch { case _: IllegalArgumentException => None }
        windows match {
          case None => fullResync() // overwrite / vacuumed window: heal
          case Some((dF, dD)) =>
            val sign = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
            // ΔF ⋈ D_new (fact sign rides along) ...
            val t1 = joined(
              dF.withColumn("_sign", sign),
              VersionedTable.read(spark, spec.dimPath, Some(dvNow)), spec)
            // ... + F_old ⋈ ΔD (dim sign rides along; fact pruned to the
            // files/rows holding the delta's keys)
            val t2 = joined(
              factForDimDelta(spark, spec, f0, dD),
              dD.withColumn("_sign", sign), spec)
            val cols = spec.groupCols ++ spec.sumCols :+ "_sign"
            val delta = t1.select(cols.map(col): _*)
              .unionByName(t2.select(cols.map(col): _*))
              .groupBy(spec.groupCols.map(col): _*)
              .agg(
                sum(col("_sign")).as("cnt"),
                spec.sumCols.map(c =>
                  sum(col("_sign") * col(c).cast("double")).as(s"sum_$c")): _*)
            val view = VersionedTable.read(spark, viewPath)
            val valueCols = view.columns.filterNot(spec.groupCols.contains).toSeq
            val old = view.select(
              spec.groupCols.map(col) ++ valueCols.map(c => col(c).as(s"__old_$c")): _*)
            val upsert = delta.join(old, spec.groupCols, "left")
              .select(
                spec.groupCols.map(col) ++ valueCols.map(c =>
                  (coalesce(col(s"__old_$c"), lit(0)) + col(c)).as(c)): _*)
              .withColumn("_del", col("cnt") === 0L)
            VersionedTable.mergeBatch(
              spark, viewPath, upsert, spec.groupCols, consumerId, enc(fvNow, dvNow),
              deleteFlag = Some("_del"))
              .map(_ => (fvNow, dvNow))
        }
    }
  }
}
