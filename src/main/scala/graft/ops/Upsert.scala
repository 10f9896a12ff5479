package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, max_by, struct}

/** Keyed upsert (SCD type-1 merge): updates win on key collision, base
  * rows without a matching key survive, brand-new keys insert. The
  * relational core of MERGE INTO for engines writing plain parquet —
  * rewrite the affected partitions with the merged frame.
  *
  * One anti join on the key set: broadcast when the update batch is small
  * (the common CDC case — Catalyst picks this from stats), shuffled hash
  * on co-partitioned inputs otherwise. No window, no driver collect.
  */
object Upsert {

  /** Plain merge. PRECONDITION: `updates` holds at most one row per key —
    * a batch with two rows for one key would emit both (real MERGE INTO
    * errors on this). CDC batches that can carry multiple versions of a
    * key must go through [[mergeLatest]] instead. */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val untouched = base.join(
      updates.select(keys.map(col): _*).distinct(),
      keys,
      "left_anti")
    updates.unionByName(untouched)
  }

  /** Merge with latest-wins conflict resolution INSIDE the batch: when the
    * CDC batch carries several rows for one key, only the row with the
    * highest `versionCol` (commit LSN / event time / batch sequence)
    * survives — `max_by` over the whole row in one keyed aggregation, the
    * same shuffle the merge join needs anyway. Ties on the version are
    * nondeterministic; suppliers of CDC feeds give versions a total order
    * per key. `versionCol` is dropped from the output unless `base`
    * carries it too. */
  def mergeLatest(
      base: DataFrame, updates: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val cols = updates.columns.toSeq
    require(cols.contains(versionCol), s"updates has no version column '$versionCol'")
    val latest = updates
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*), col(versionCol)).as("_r"))
      .select(cols.map(c => col(s"_r.`$c`").as(c)): _*)
    val resolved = if (base.columns.contains(versionCol)) latest else latest.drop(versionCol)
    merge(base, resolved, keys)
  }
}
