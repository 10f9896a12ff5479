package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.ops.ConnectedComponents

/** Throwaway stage profiler for q88 (not part of the contract surface). */
object ProfileQ88 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus, "q88prof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (_ <- 1 to 3) {
      val docs = Tables.documents(spark, sfDir)
        .filter(TextFunctions.tokenCount(col("text")) >= 3)
      val sh = docs.select(
        col("doc_id"),
        explode(graft.functions.ShingleHashSetExpr(
          TextFunctions.tokens(col("text")), 3)).as("h"))
      time("exploded shingles")(sh.count())
      val edges = sh.groupBy("h").agg(
        count(lit(1)).as("df"),
        min(col("doc_id")).as("src"),
        max(col("doc_id")).as("dst"))
        .filter(col("df") === 2)
        .select("src", "dst")
        .distinct()
      time("edges")(edges.count())
      val (labels, rounds) = time("label loop")(ConnectedComponents.label(edges))
      time("labels.count")(labels.count())
      println(s"[prof] rounds=$rounds")
    }
    spark.stop()
  }
}
