package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * built-ins (`zip_with`/`aggregate`) per SURVEY.md §2.12 policy — no UDFs,
  * so the expressions stay inside whole-stage codegen and are pushdown-safe.
  *
  * All arithmetic is done in double (float32 inputs widen exactly) so
  * results are deterministic and match oracle engines computing in double.
  */
object Vectors {

  /** Cast an `array<float>` column to `array<double>`. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product — sequential left-to-right fold, O(d) per row. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine given precomputed norms (avoids re-deriving the build-side norm
    * per candidate pair — the norm is computed once per row upstream). */
  def cosinePrenormed(a: Column, b: Column, aNorm: Column, bNorm: Column): Column =
    dot(a, b) / (aNorm * bNorm)
}
