package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  // ── PCA whitening ───────────────────────────────────────────────────
  //
  // Decorrelate + unit-variance the embedding space before clustering /
  // semantic dedup (SemDeDup-style pipelines whiten so cosine thresholds
  // mean the same thing in every direction). The 100 TB shape:
  //
  //   1. ONE aggregation pass collects the sufficient statistics
  //      (n, Σx, upper-triangular Σ x xᵀ) in an O(d²) buffer — map-side
  //      combined, d² ≈ a few KB per task for typical embedding widths;
  //      the data is never shuffled, only the tiny moment vectors.
  //   2. The d×d eigendecomposition happens ON THE DRIVER (breeze
  //      `eigSym` — d×d is microscopic next to the data).
  //   3. The projection W and mean are folded into per-row ARRAY
  //      EXPRESSIONS (typedLit matrix + transform/zip_with/aggregate) —
  //      no UDF, no shuffle, rows never leave their partitions.

  /** Sufficient statistics of a float-vector column: buffer =
    * [n, Σx (d), Σ xxᵀ upper triangle (d(d+1)/2)]. */
  private[ops] final class MomentsAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      require(v.length == d, s"expected dim $d, got ${v.length}")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = v(i).toDouble; i += 1 }
      b(0) += 1.0
      i = 0
      var t = 1 + d
      while (i < d) {
        b(1 + i) += x(i)
        var j = i
        while (j < d) { b(t) += x(i) * x(j); j += 1; t += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Double]): Array[Double] = b
    override def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** A fitted whitening model: y = Wᵀ (x − mean), `w` laid out as one
    * column (output component) per row of the outer Seq. */
  final case class WhitenModel(mean: Seq[Double], w: Seq[Seq[Double]])

  /** Fit PCA whitening on `vecCol` (array<float>, width `d`): the top
    * `components` eigenvectors of the sample covariance, each scaled by
    * `1/sqrt(λ + eps)`, ordered by descending eigenvalue (ties broken by
    * the deterministic eigendecomposition). One pass over the data. */
  def fitWhitening(
      df: DataFrame, vecCol: String, d: Int, components: Int,
      eps: Double = 1e-9): WhitenModel = {
    require(components >= 1 && components <= d)
    val moments = df.select(col(vecCol).as("v"))
      .agg(udaf(new MomentsAgg(d)).apply(col("v")).as("m"))
      .head().getSeq[Double](0).toArray
    val n = moments(0)
    require(n >= 2, "whitening needs at least 2 vectors")
    val mean = Array.tabulate(d)(i => moments(1 + i) / n)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (moments(t) - n * mean(i) * mean(j)) / (n - 1.0)
        cov(i, j) = c; cov(j, i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val order = (0 until d).sortBy(k => -es.eigenvalues(k)).take(components)
    val w = order.map { k =>
      val scale = 1.0 / math.sqrt(math.max(es.eigenvalues(k), 0.0) + eps)
      // sign convention: flip so the largest-|.|-entry is positive —
      // eigenvector sign is otherwise arbitrary and run-dependent
      val vec = (0 until d).map(r => es.eigenvectors(r, k))
      val anchor = vec.maxBy(math.abs)
      val s = if (anchor < 0) -scale else scale
      vec.map(_ * s)
    }
    WhitenModel(mean.toSeq, w)
  }

  /** Adds `<out>` = whitened projection of `vecCol` under `model` —
    * pure array expressions over the broadcast-as-literal matrix: center
    * once (`zip_with`), then one dot product per output component
    * (`transform` over the matrix rows + `aggregate`). No UDF, no
    * shuffle. */
  def whiten(df: DataFrame, vecCol: String, model: WhitenModel, out: String): DataFrame = {
    val meanLit = typedlit(model.mean)
    val wLit = typedlit(model.w)
    df.withColumn("__xc",
      zip_with(col(vecCol), meanLit, (a, m) => a.cast("double") - m))
      .withColumn(out,
        transform(wLit, row =>
          aggregate(zip_with(col("__xc"), row, (a, b) => a * b),
            lit(0.0), (acc, v) => acc + v)))
      .drop("__xc")
  }
}
