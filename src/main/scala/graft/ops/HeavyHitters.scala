package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-items ("heavy hitters") over a key column without a full
  * groupBy — the bounded-memory pattern for 100 TB vocab/entity analysis.
  *
  * Phase 1 (candidates): a Misra-Gries summary per partition, merged with
  * the mergeable-summaries construction (Agarwal et al., PODS'12) — at
  * most k counters ever exist per buffer, so the shuffle ships O(k) state
  * per partition instead of one row per distinct key (the full groupBy
  * ships |vocab| rows; a web-scale token vocab is billions).
  * Guarantee: any key with true frequency > n/(k+1) survives; counts
  * under-estimate by at most n/(k+1). The summary CONTENT (not the
  * guarantee) depends on merge order, so phase 1 alone is not
  * reproducible across layouts.
  *
  * Phase 2 (verify): one exact counting pass restricted to the ≤ k
  * candidates via broadcast semi-join. Exact counts, deterministic
  * output, and the scan never shuffles more than k distinct keys. This
  * candidates→verify shape is the same one the dedup pipeline uses
  * (LSH candidates → exact Jaccard).
  */
object HeavyHitters {

  /** Misra-Gries summary of a string key column, at most k counters. */
  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(c) => b.updated(w, c + 1L)
        case None if b.size < k => b.updated(w, 1L)
        case None =>
          // Decrement-all step: drop zeroed counters, the new key is
          // absorbed by the decrement (classic MG).
          b.flatMap { case (key, c) => if (c > 1L) Some(key -> (c - 1L)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // Mergeable-summaries merge: subtract the (k+1)-th largest count,
        // drop non-positive — at most k counters survive and the
        // n/(k+1) error bound is preserved.
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Phase 1: ≤ k candidate keys (single row, map key → MG estimate). */
  def candidates(keys: DataFrame, key: Column, k: Int): DataFrame = {
    val agg = udaf(new MisraGriesAgg(k))
    keys.select(key.cast("string").as("k")).agg(agg(col("k")).as("mg"))
      .select(explode(map_keys(col("mg"))).as("key"))
  }

  /** Phase 2: exact counts of the candidates, top n by (count desc, key).
    * Output columns: key, cnt — deterministic whenever the true top-n all
    * clear the n/(k+1) survival bound. */
  def topExact(keys: DataFrame, key: Column, k: Int, n: Int): DataFrame = {
    val cand = candidates(keys, key, k)
    keys.select(key.cast("string").as("key"))
      .join(broadcast(cand), "key") // ≤ k candidate keys: broadcast, never shuffle the scan
      .groupBy("key")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(n)
  }
}
