package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** Registers the engine's custom functions for SQL use. */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_distance",
      exprs => HammingDistance(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler_similarity",
      exprs => JaroWinklerSim(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interleave_bits",
      exprs => InterleaveBits(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interleave_bits_n",
      exprs => InterleaveBitsN(
        org.apache.spark.sql.catalyst.expressions.CreateArray(
          exprs.map(e => org.apache.spark.sql.catalyst.expressions.Cast(
            e, org.apache.spark.sql.types.LongType))),
        exprs.size),
      "scala_udf")
    spark.udf.register("weighted_avg", udaf(WeightedAvg))
    spark.udf.register("dd_sketch", udaf(DdSketch.SketchAgg))
    spark.udf.register("dd_merge", udaf(DdSketch.MergeAgg))
    spark.udf.register("dd_quantile",
      (sk: Map[Int, Long], q: Double) => DdSketch.quantile(sk, q))
  }
}
