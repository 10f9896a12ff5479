package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.SparkEntry

/** Throwaway per-JOB profiler for any registry query (not part of the
  * contract surface): runs the named query warm + timed passes and
  * prints every Spark job's wall time with its description — the
  * local-mode stand-in for the UI's Jobs tab when deciding whether a
  * query's cost is scan, shuffle, or driver-loop job count (guide §1/§7).
  *
  * Usage: runMain graft.tools.ProfileJobs <query> [sfDir] [passes]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val qName = args.headOption.getOrElse(sys.error("usage: ProfileJobs <query> [sfDir]"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus, "jobprof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new ConcurrentHashMap[Int, (Long, String, Int)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (record) {
        Option(starts.get(je.jobId)).foreach { case (t0, desc, nTasks) =>
          println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  " +
            f"tasks=$nTasks%4d  $desc")
        }
      }
    })
    val q = SparkEntry.registry.find(_.name == qName)
      .getOrElse(sys.error(s"no query named $qName"))
    def once(label: String): Unit = {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[pass] $label total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    once("warmup")
    record = true
    (1 to passes).foreach(i => once(s"timed-$i"))
    spark.stop()
  }
}
