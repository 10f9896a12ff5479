package graft.tools

import graft.core.Tables
import graft.ops.SetSimJoin

/** Throwaway end-to-end profiler for q211 (not part of the contract surface). */
object ProfileSetSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus, "ssprof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (_ <- 1 to 4) {
      val tok0 = SetSimJoin.wordShingles(Tables.documents(spark, sfDir), "doc_id", "text", 3)
      val n = time("full q211 end-to-end") {
        SetSimJoin.selfJoin(tok0, 0.6).orderBy("id_a", "id_b").count()
      }
      println(s"[prof] pairs = $n")
    }
    spark.stop()
  }
}
