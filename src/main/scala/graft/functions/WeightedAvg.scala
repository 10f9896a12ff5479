package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.12 demo): weighted average via
  * `Aggregator[IN, BUF, OUT]` + `functions.udaf`. Chosen over an
  * exact-median demo because its buffer is O(1) — safe to shuffle at any
  * scale (partial aggregation merges two doubles, map-side combine works).
  *
  * Register: `spark.udf.register("weighted_avg", functions.udaf(WeightedAvg))`
  * then SQL `weighted_avg(value, weight)` or Dataset `udaf` column.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
