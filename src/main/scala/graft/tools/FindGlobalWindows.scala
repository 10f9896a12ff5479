package graft.tools

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Scratch diagnostic: lists registry queries whose optimized plan contains
  * a Window with an empty partition spec (the source of WindowExec's "No
  * Partition Defined" warning), so bounded-by-design sites can be moved to
  * [[graft.core.Windows.bounded]].
  */
object FindGlobalWindows {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.builder("local[8]", 8, "graft-diag").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- graft.SparkEntry.registry) {
      try {
        val n = q.run(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) println(s"GLOBALWINDOW ${q.name} $n")
      } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage}") }
    }
    spark.stop()
  }
}
