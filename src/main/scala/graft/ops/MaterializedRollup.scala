package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Incrementally-maintained materialized rollup: a per-group aggregate
  * state table refreshed by MERGING each new batch's partial aggregates —
  * never by re-scanning the fact table. This is the 100 TB answer to
  * "keep corpus accounting current as data lands": refresh cost scales
  * with the INCREMENT (one keyed shuffle of the batch) plus the state
  * (one row per group), while a recompute would re-shuffle the corpus.
  *
  * The state row is the classic decomposable-aggregate vector —
  * `(count, sum, min, max)` plus a mergeable HLL sketch for distinct
  * counts — so the merge is itself a `groupBy(keys)` over
  * `state ∪ batch-partials`: count/sum ADD, min/max MIN/MAX,
  * sketch `hll_union_agg`. Algebraic aggregates (avg) finalize from the
  * vector at read time; only holistic ones (exact medians) are out, and
  * those ship as sketches ([[graft.functions.DdSketch]]) by design.
  *
  * Persistence rides [[VersionedTable]]: each refresh commits the merged
  * state as a new version (time-travelable accounting history), and the
  * exactly-once variant records `(writerId, batchId)` so a replayed
  * streaming micro-batch cannot double-merge — the foreachBatch
  * maintained-view loop is
  * `stream → batchPartials → merge with state → commitOverwriteBatch`.
  */
object MaterializedRollup {

  /** State columns appended to the group keys. */
  val StateCols: Seq[String] = Seq("n_rows", "sum_v", "min_v", "max_v", "ndv_sk")

  /** One batch reduced to per-group partials — the only shuffle a refresh
    * performs, over increment rows only (map-side partial agg applies). */
  def batchPartials(
      batch: DataFrame, groupCols: Seq[String], valueCol: String, ndvCol: String): DataFrame =
    batch
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        hll_sketch_agg(col(ndvCol)).as("ndv_sk"))

  /** Merge stored state with a new batch's partials. Every state column is
    * decomposable, so merging k batches in ANY order/grouping equals the
    * one-shot aggregate over their union (MaterializedRollupSpec asserts
    * this exactly for count/sum/min/max and sketch-identically for NDV). */
  def mergePartials(state: DataFrame, delta: DataFrame, groupCols: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        hll_union_agg(col("ndv_sk")).as("ndv_sk"))

  /** Read-time finalization: algebraic aggregates derive from the state
    * vector; the sketch finalizes to an estimate. */
  def finalized(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.select(
      groupCols.map(col) ++ Seq(
        col("n_rows"),
        col("sum_v"),
        (col("sum_v") / col("n_rows")).as("avg_v"),
        col("min_v"),
        col("max_v"),
        hll_sketch_estimate(col("ndv_sk")).as("ndv_est")): _*)

  /** Refresh the materialized state at `tablePath` with one batch: merge
    * its partials into the stored state (empty on first use) and commit
    * the result as a new version. Pass `txn = Some(writerId -> batchId)`
    * from a streaming foreachBatch to make the refresh replay-proof
    * (skipped duplicates return None). */
  def refresh(
      spark: SparkSession,
      tablePath: String,
      batch: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ndvCol: String,
      txn: Option[(String, Long)] = None): Option[Long] = {
    val delta = batchPartials(batch, groupCols, valueCol, ndvCol)
    val merged =
      if (VersionedTable.versions(spark, tablePath).isEmpty) delta
      else mergePartials(VersionedTable.read(spark, tablePath), delta, groupCols)
    txn match {
      case Some((writerId, batchId)) =>
        // the duplicate check runs before the merge materializes anything
        if (VersionedTable.lastCommittedBatch(spark, tablePath, writerId).exists(_ >= batchId))
          None
        else VersionedTable.commitOverwriteBatch(merged, tablePath, writerId, batchId)
      case None =>
        Some(VersionedTable.commitOverwrite(merged, tablePath))
    }
  }

  /** Current finalized view of the maintained rollup. */
  def read(spark: SparkSession, tablePath: String, groupCols: Seq[String]): DataFrame =
    finalized(VersionedTable.read(spark, tablePath), groupCols)
}
