package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.SetSimJoin

/** Throwaway profiler for q211 (not part of the contract surface):
  * end-to-end time plus candidate-count instrumentation replicating the
  * internal stages (kept in sync with [[SetSimJoin.selfJoin]] by hand —
  * this is a diagnostics tool, not a contract). */
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
    val t = 0.6
    val tok0 = SetSimJoin.wordShingles(Tables.documents(spark, sfDir), "doc_id", "text", 3)
    val tok = tok0.select(col("id"), col("w")).distinct()
    val freq = tok.groupBy("w").agg(count(lit(1)).as("df"))
    val sets = tok.join(freq, "w")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("es"))
      .select(col("id"), expr("transform(es, e -> e.w)").as("ws"), size(col("es")).as("sz"))
    val prefix = sets
      .select(col("id"), col("sz"),
        posexplode(expr(s"slice(ws, 1, size(ws) - cast(ceil($t * size(ws)) as int) + 1)"))
          .as(Seq("p0", "w")))
      .select(col("id"), col("sz"), (col("p0") + 1).as("r"), col("w"))
    val minOverlap = ceil(lit(t / (1 + t)) * (col("a.sz") + col("b.sz")) - lit(1e-9))
    val joined = prefix.as("a").join(prefix.as("b"), Seq("w"))
      .filter(col("a.id") < col("b.id"))
      .filter(col("a.sz") * lit(t) <= col("b.sz") && col("b.sz") * lit(t) <= col("a.sz"))
    println(s"[prof] raw prefix pairs (size-filtered) = ${time("raw")(joined.count())}")
    val pos = joined.filter(
      lit(1) + least(col("a.sz") - col("a.r"), col("b.sz") - col("b.r")) >= minOverlap)
    println(s"[prof] after positional filter = ${time("positional")(pos.count())}")
    println(s"[prof] distinct candidates = ${time("distinct")(
      pos.select(col("a.id"), col("b.id")).distinct().count())}")
    for (_ <- 1 to 3) {
      val n = time("full q211 end-to-end") {
        SetSimJoin.selfJoin(tok0, t).orderBy("id_a", "id_b").count()
      }
      println(s"[prof] pairs = $n")
    }
    spark.stop()
  }
}
