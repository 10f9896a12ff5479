package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain registries; each entry
  * carries its own DuckDB oracle SQL (or None → rows-only check).
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    graft.queries.Relational.all ++
      graft.queries.Events.all ++
      graft.queries.Text.all ++
      graft.queries.Similarity.all ++
      graft.queries.Misc.all ++
      graft.queries.TrainPrep.all ++
      graft.queries.Stats.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q16.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin)).toMap

  /** Queries DELIBERATELY exempt from the DuckDB oracle (sketch
    * estimates, seeded sampling, learned models — shapes SQL cannot
    * replay exactly; each is spec-gated instead). Emitted by [[Verify]]
    * as `rows_only.json` so the driver's `no_oracle` entries are
    * auditable from the artifact alone; QueriesSpec pins this set
    * against a hand-maintained allowlist so an entry cannot silently
    * drop its oracle. */
  def rowsOnly: Seq[String] =
    registry.filter(_.oracle.isEmpty).map(_.name).sorted
}
