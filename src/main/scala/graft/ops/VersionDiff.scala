package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Semantic diff between two versions of a versioned table: what NET
  * changed per key — added / removed / value-changed (and which columns)
  * — the "what happened to this table since yesterday?" audit behind
  * release reviews and CDC reconciliation.
  *
  * Built on the row-level change feed ([[VersionedTable.changesWithType]])
  * rather than two snapshots, so the cost is proportional to the CHANGES
  * in the window, never the table: a 100 TB table with a million changed
  * rows diffs by shuffling a million rows on the key. Per key, events
  * order by (commit version, delete-before-insert) — a merge tombstones
  * the old row and inserts the new one in the SAME commit — so the first
  * event tells whether the key existed at `fromVersion` (first event
  * delete ⇒ it did) and the last whether it exists at `toVersion` (last
  * event insert ⇒ it does). Keys touched but net-identical (insert of an
  * equal row after a delete) are reported as `n_rewritten_same`, not
  * changes.
  */
object VersionDiff {

  /** Per-key net classification: (keyCols..., status, before, after)
    * where status ∈ added | removed | changed | rewritten_same and
    * before/after are the payload structs (null when absent). Transient
    * keys (inserted AND removed inside the window) net to nothing and
    * are dropped. */
  def perKey(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      toVersion: Long,
      keyCols: Seq[String]): DataFrame = {
    val ch = VersionedTable.changesWithType(spark, path, fromVersion, toVersion)
    val dataCols = ch.columns.filterNot(c =>
      keyCols.contains(c) || c == "_change_type" || c == "_commit_version")
    val evOrd = struct(
      col("_commit_version"),
      when(col("_change_type") === "delete", 0).otherwise(1))
    val ev = struct(
      col("_change_type").as("t"),
      struct(dataCols.map(col): _*).as("p"))
    ch.groupBy(keyCols.map(col): _*)
      .agg(min_by(ev, evOrd).as("_first"), max_by(ev, evOrd).as("_last"))
      .select(
        keyCols.map(col) ++ Seq(
          (col("_first.t") === "delete").as("_existed"),
          (col("_last.t") === "insert").as("_present"),
          col("_first.p").as("before"),
          col("_last.p").as("after")): _*)
      .withColumn(
        "status",
        when(!col("_existed") && col("_present"), "added")
          .when(col("_existed") && !col("_present"), "removed")
          .when(col("_existed") && col("_present") && !(col("before") <=> col("after")),
            "changed")
          .when(col("_existed") && col("_present"), "rewritten_same"))
      .filter(col("status").isNotNull) // transient: never existed at either end
      .select(keyCols.map(col) :+ col("status") :+
        when(col("_existed"), col("before")).as("before") :+
        when(col("_present"), col("after")).as("after"): _*)
  }

  /** One-row summary: n_added / n_removed / n_changed / n_rewritten_same
    * plus a `chg_<col>` count per payload column (how many changed keys
    * differ in that column — null-safe comparison). */
  def summary(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      toVersion: Long,
      keyCols: Seq[String]): DataFrame = {
    val pk = perKey(spark, path, fromVersion, toVersion, keyCols)
    val dataCols = pk.select("before.*").columns.toSeq
    def cnt(c: Column): Column = coalesce(sum(when(c, 1L)), lit(0L))
    val perColumn = dataCols.map { c =>
      cnt(col("status") === "changed" &&
        !(col(s"before.$c") <=> col(s"after.$c"))).as(s"chg_$c")
    }
    pk.agg(
      cnt(col("status") === "added").as("n_added"),
      cnt(col("status") === "removed").as("n_removed") +:
        cnt(col("status") === "changed").as("n_changed") +:
        cnt(col("status") === "rewritten_same").as("n_rewritten_same") +:
        perColumn: _*)
  }
}
