package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{lit, udaf, udf}

/** Mergeable quantile sketch — the percentile analog of q105's HLL rollup
  * (precompute per-partition/per-day sketches once, answer any rollup by
  * merging, never re-scan). Log-bucketed histogram with relative-error
  * guarantee alpha, the publicly-documented DDSketch construction
  * (Masson/Rim/Lee, VLDB'19; same family as HdrHistogram): value v > 0
  * maps to bucket ceil(log_gamma v) with gamma = (1+a)/(1-a), so every
  * bucket's midpoint estimate is within a·v of any value it holds.
  *
  * Why this construction for 100 TB:
  *   - merge = per-key count ADD — associative + commutative, so the
  *     merged sketch is bit-identical no matter how rows were partitioned
  *     or which executor merged first (t-digest/GK summaries are
  *     order-sensitive: same data, different cluster, different answer);
  *   - the buffer is a sparse int→long map, ~one entry per occupied
  *     bucket (≤ ~2.3k buckets spans 1e-9..1e12 at a=1%) — safe to
  *     shuffle as a partial-aggregation buffer;
  *   - quantile extraction runs on ONE aggregated row per group (a UDF is
  *     fine there — it is not the per-row hot path).
  *
  * Values ≤ 0 land in a reserved bucket estimating 0.0 (totalprice-style
  * metrics; a signed variant would mirror the negative axis).
  */
object DdSketch {

  /** Relative-error guarantee of the bucket layout. */
  val Alpha = 0.01

  private val gamma = (1 + Alpha) / (1 - Alpha)
  private val logGamma = math.log(gamma)

  /** Reserved bucket for v <= 0 (sorts below every real bucket). */
  val ZeroKey: Int = Int.MinValue

  def key(v: Double): Int =
    if (v <= 0.0) ZeroKey else math.ceil(math.log(v) / logGamma).toInt

  /** Bucket midpoint (geometric): within Alpha of any value in bucket k. */
  def estimate(k: Int): Double =
    if (k == ZeroKey) 0.0 else 2.0 * math.pow(gamma, k) / (gamma + 1)

  /** q-quantile (q in [0,1]) of the values a sketch summarizes. */
  def quantile(sk: Map[Int, Long], q: Double): Double = {
    val total = sk.valuesIterator.sum
    if (total == 0L) Double.NaN
    else {
      val target = math.max(1L, math.ceil(q * total).toLong)
      val sorted = sk.toSeq.sortBy(_._1)
      var cum = 0L
      sorted.collectFirst {
        case (k, c) if { cum += c; cum >= target } => estimate(k)
      }.getOrElse(estimate(sorted.last._1))
    }
  }

  private def add(b: Map[Int, Long], k: Int, c: Long): Map[Int, Long] =
    b.updated(k, b.getOrElse(k, 0L) + c)

  /** value column → sketch (map<int,bigint> of bucket counts). */
  object SketchAgg extends Aggregator[Double, Map[Int, Long], Map[Int, Long]] {
    override def zero: Map[Int, Long] = Map.empty
    override def reduce(b: Map[Int, Long], v: Double): Map[Int, Long] = add(b, key(v), 1L)
    override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
      b.foldLeft(a) { case (acc, (k, c)) => add(acc, k, c) }
    override def finish(b: Map[Int, Long]): Map[Int, Long] = b
    override def bufferEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder[Map[Int, Long]]()
    override def outputEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder[Map[Int, Long]]()
  }

  /** sketch column → union sketch (second-level rollup). */
  object MergeAgg extends Aggregator[Map[Int, Long], Map[Int, Long], Map[Int, Long]] {
    override def zero: Map[Int, Long] = Map.empty
    override def reduce(b: Map[Int, Long], s: Map[Int, Long]): Map[Int, Long] = merge(b, s)
    override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
      b.foldLeft(a) { case (acc, (k, c)) => add(acc, k, c) }
    override def finish(b: Map[Int, Long]): Map[Int, Long] = b
    override def bufferEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder[Map[Int, Long]]()
    override def outputEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder[Map[Int, Long]]()
  }

  private lazy val sketchUdaf = udaf(SketchAgg)
  private lazy val mergeUdaf = udaf(MergeAgg)
  private lazy val quantileUdf = udf((sk: Map[Int, Long], q: Double) => quantile(sk, q))

  /** Aggregate a double column into a sketch. */
  def sketch(c: Column): Column = sketchUdaf(c)

  /** Merge a column of sketches into one. */
  def merge(c: Column): Column = mergeUdaf(c)

  /** Extract a quantile from a sketch column (one row per group —
    * post-aggregation cold path, not per-row). */
  def quantileOf(sk: Column, q: Double): Column = quantileUdf(sk, lit(q))
}
