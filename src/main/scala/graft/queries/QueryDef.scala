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

/** Fixed per-query scratch roots for versioned-table fixtures (q162
  * policy, generalized): `dir(name)` pre-cleans and returns
  * `$TMPDIR/graft_scratch_<name>`, so repeated verify/bench runs REUSE
  * one footprint instead of leaking a table copy per run. Queries whose
  * result reads the fixture lazily keep the dir alive past return and
  * rely on the NEXT run's pre-clean; queries that materialize eagerly
  * delete it themselves via [[Scratch.rmTree]]. Runs are sequential
  * (driver verify/bench, sbt's forked sequential test JVM) — two
  * concurrent JVMs running the SAME query would race, so don't overlap
  * manual runs of one query. */
object Scratch {
  def dir(name: String): String = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_scratch_$name")
    rmTree(root.toFile)
    root.toString
  }
  def rmTree(p: java.io.File): Unit = {
    Option(p.listFiles).foreach(_.foreach(rmTree)); p.delete(); ()
  }
}
