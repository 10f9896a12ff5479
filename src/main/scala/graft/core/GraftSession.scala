package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Encodes the performance obligations from SURVEY.md §6 / BASELINE.md:
  * UTC session timezone (oracle parity), AQE on (runtime re-planning,
  * skew-join splitting), shuffle partitions sized to the local core count
  * rather than Spark's default 200 (the reference inherits the 200-partition
  * default over ~34k rows — pure overhead; see `/root/reference`
  * `Main.scala:10` which sets only `master("local[*]")`).
  *
  * On a real cluster the same builder is used with `master` unset (taken
  * from spark-submit) and `shufflePartitions` sized to ~2-3× total cores;
  * AQE coalesces downward at runtime so oversizing is safe.
  */
object GraftSession {

  /** WindowExec logs "No Partition Defined" per execution for ANY
    * empty-partition window — including the engine's deliberately bounded
    * ones ([[Windows.bounded]]: per-bucket stats, calendar rows, top-N
    * vocab), which spams hundreds of identical lines per bench run. The
    * heuristic is replaced by something stronger: PlanShapeSpec fails CI
    * for any REGISTRY query whose plan runs an effectively-unpartitioned
    * window over unaggregated (data-sized) input. Scoped to the one
    * logger; everything else keeps its level.
    *
    * Limitation: ad-hoc pipelines built on [[builder]] outside the registry
    * are NOT covered by that spec and lose the warning too — set
    * `GRAFT_KEEP_WINDOW_WARNING=1` to keep WindowExec at its default level
    * for interactive use.
    *
    * Timing matters: log4j re-reads its configuration when the first
    * SparkContext initializes logging, and `setLogLevel` rebuilds levels
    * again — either wipes a level set before/between them. Callers that run
    * `setLogLevel` after `getOrCreate()` (Bench, Verify) must re-apply this
    * AFTERWARD via [[quietLogs]]; `builder()` also applies it eagerly for
    * sessions that never touch log levels.
    */
  def quietLogs(): Unit =
    if (!sys.env.contains("GRAFT_KEEP_WINDOW_WARNING")) {
      try org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        org.apache.logging.log4j.Level.ERROR)
      catch { case _: Throwable => () } // logging backend absent: nothing to quiet
    }

  private[core] def quietBoundedWindowWarning(): Unit = quietLogs()

  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession.Builder = {
    quietBoundedWindowWarning()
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Fixture events.parquet carries TIMESTAMP(NANOS), which the
      // vectorized parquet reader rejects; declared session-wide here (not
      // mutated per-read) so every nanos column in the session reads as a
      // raw long and the ns→µs policy lives in one place (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Bucketed scans CLAIM their per-bucket sort order only behind this
      // flag (Spark turned it off by default because the single-file-per-
      // bucket check lists files at planning). The only bucketed relations
      // in a graft session are VersionedTable's own (written sorted by
      // commitBucketed), so the claim is always sound here — and it is
      // what lets a compacted co-bucketed SMJ skip its sorts entirely.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // Engine functions + the conf-gated approx-aggregate rule ride the
      // standard extension point, so they exist in every session created
      // from this builder (and in spark-submit'd clusters that set the
      // same conf) without a registration call.
      .config("spark.sql.extensions", classOf[graft.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    quietLogs() // setLogLevel rebuilt logger levels; re-apply the override
    s
  }
}
