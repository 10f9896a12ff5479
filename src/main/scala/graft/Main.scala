package graft

import graft.core.GraftSession
import graft.io.Sinks
import graft.pipeline.PowerPipeline

/** Subcommand CLI (replaces the reference's edit-`Main`-between-runs wiring,
  * `/root/reference` `Main.scala:18`):
  *
  *   graft.Main pipeline <rawPowerCsv> <outCsv>   reference-parity pipeline
  *   graft.Main query <name> <sfDir>              run one declared query
  *   graft.Main list                              list declared queries
  */
object Main {
  def main(args: Array[String]): Unit = args.toList match {
    case "pipeline" :: raw :: out :: Nil =>
      implicit val spark = GraftSession.local()
      val prepared = PowerPipeline.castNumerics(
        PowerPipeline.addDateTime(
          PowerPipeline.replaceMissing(PowerPipeline.loadRaw(spark, raw))))
      prepared.cache()
      val stats = PowerPipeline.beforeStats(prepared)
      println(s"[graft] before-clean stats: $stats")
      val result = PowerPipeline.run(spark, raw)
      Sinks.singleFileCsv(result, out)
      println(s"[graft] wrote ${result.count()} hourly rows -> $out")
      spark.stop()
    case "query" :: name :: sfDir :: Nil =>
      val spark = GraftSession.local()
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).show(20, truncate = false)
        case None =>
          System.err.println(s"unknown query '$name'; try: graft.Main list")
          sys.exit(1)
      }
      spark.stop()
    case "explain" :: name :: sfDir :: Nil =>
      val spark = GraftSession.local()
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query '$name'"); sys.exit(1)
      }
      spark.stop()
    case "list" :: Nil =>
      SparkEntry.registry.foreach(q =>
        println(f"${q.name}%-28s oracle=${q.oracle.isDefined}%-5s headline=${q.headline}"))
    case other =>
      System.err.println(
        s"usage: pipeline <rawCsv> <outCsv> | query <name> <sfDir> | list (got: $other)")
      sys.exit(1)
  }
}
