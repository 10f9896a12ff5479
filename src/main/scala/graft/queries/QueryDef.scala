package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared capability query (SURVEY.md §2.13 contract).
  *
  * @param name    stable key — used by the driver's Verify/Bench harnesses
  * @param run     Spark implementation: (session, fixture dir) => result
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet
  *                tables; None for non-SQL-expressible ops (driver then
  *                records a weaker rows-only check)
  * @param headline included in the Bench harness' headline set
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
