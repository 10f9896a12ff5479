package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val untouched = base.join(
      updates.select(keys.map(col): _*).distinct(),
      keys,
      "left_anti")
    updates.unionByName(untouched)
  }
}
