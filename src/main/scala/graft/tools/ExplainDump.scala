package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Plan-evidence dumper for the optimization rounds: writes
  * `.explain("formatted")` output for headline queries to
  * `<outDir>/<query>.txt` — the initial plan first, then (after one
  * noop-sink execution) the final AQE plan, so exchange counts, join
  * strategies, PushedFilters and ReadSchema are all checkable from the
  * committed file alone.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> [q1,q2,...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("plans/tmp")
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus, "graft-explain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.quietLogs()
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    // an explicit list overrides the headline filter: optimization
    // evidence is also needed for oracle-gated non-headline queries
    // (q137/q144 share the repeatedSpans path with headline q138)
    SparkEntry.registry.filter(q =>
      only.fold(q.headline)(_.contains(q.name)))
      .foreach { q =>
        try {
          val df = q.run(spark, sfDir)
          val initial = df.queryExecution.explainString(mode)
          // execute THIS QueryExecution (a noop write would plan a fresh
          // one, leaving df's AdaptiveSparkPlanExec unexecuted and the
          // "final" dump byte-identical to the initial) — same pitfall
          // PlanMetrics.run documents
          df.queryExecution.toRdd.foreachPartition(it => it.foreach(_ => ()))
          val fin = df.queryExecution.explainString(mode)
          val txt =
            s"== ${q.name} @ $sfDir ==\n\n-- initial plan --\n$initial\n" +
              s"-- final plan (after one noop execution; AQE-resolved) --\n$fin"
          Files.write(Paths.get(s"$outDir/${q.name}.txt"),
            txt.getBytes(StandardCharsets.UTF_8))
          println(s"[explain] wrote $outDir/${q.name}.txt")
        } catch {
          case e: Throwable =>
            System.err.println(s"[explain] ${q.name} FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
