package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.ops.Dedup

/** Throwaway stage profiler for q27 (not part of the contract surface). */
object ProfileQ27 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus, "q27prof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    for (_ <- 1 to 3) {
      val shingled = docs
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), graft.functions.ShingleHashSetExpr(col("toks"), 3).as("sh"))
      time("shingled.count")(shingled.count())
      val banded = shingled.select(
        col("doc_id"),
        posexplode(graft.functions.MinHashBandKeysFromHashesExpr(col("sh"), 32, 8))
          .as(Seq("band_idx", "band_hash")))
      time("banded.count")(banded.count())
      val buckets = banded.groupBy("band_idx", "band_hash")
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")).between(2, 1000))
      val candidates = buckets
        .select(explode(col("ids")).as("a_id"), col("ids"))
        .select(col("a_id"), explode(col("ids")).as("b_id"))
        .filter(col("a_id") < col("b_id"))
        .dropDuplicates("a_id", "b_id")
      time("candidates.count")(candidates.count())
      val full = Dedup.minhashNearDupPairs(docs, "text", "doc_id")
      time("full pairs.count")(full.count())
    }
    spark.stop()
  }
}
