package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column transforms a vector pipeline runs before indexing:
  * L2 normalization (so cosine becomes a dot product) and int8 scalar
  * quantization (4× smaller vectors for the ANN index; the standard
  * memory/recall trade at billion-vector scale).
  *
  * All per-row expression compositions — no shuffle, no UDF. The
  * per-vector extrema/norm are computed ONCE into a column and referenced
  * by the element lambda, not re-derived per element. (The lambdas are
  * interpreted, not codegen'd — fine off the hot path; the ANN hot loop
  * stays on the fused [[graft.functions.CosineSimilarity]].)
  */
object Embeddings {

  /** Sequential-fold sum of squares (matches a left-fold oracle exactly). */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Adds `<out>` = unit-length copy of `vecCol` (array<double>); a
    * zero-norm vector stays all-zero rather than NaN. */
  def l2Normalized(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn("__norm", l2Norm(col(vecCol)))
      .withColumn(out, when(col("__norm") === 0.0, col(vecCol))
        .otherwise(transform(col(vecCol), x => x / col("__norm"))))
      .drop("__norm")

  /** Adds `<out>` = int8-range quantization of `vecCol`: each element maps
    * to floor((x - min) / ((max - min) / 255)) clamped to [0, 255], with
    * per-vector min kept alongside as `<out>_lo` and the step as
    * `<out>_scale` (what a dequantizing reader needs). A constant vector
    * (max == min) quantizes to all zeros. */
  def quantizeInt8(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(s"${out}_lo", array_min(col(vecCol)))
      .withColumn(s"${out}_scale", (array_max(col(vecCol)) - col(s"${out}_lo")) / 255.0)
      .withColumn(out,
        when(col(s"${out}_scale") === 0.0,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            x => least(floor((x - col(s"${out}_lo")) / col(s"${out}_scale")), lit(255.0)).cast("int"))))
}
