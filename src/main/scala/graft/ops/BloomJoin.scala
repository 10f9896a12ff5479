package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomProbeExpr
import graft.io.FileBloom

/** Runtime Bloom-filter semi-join reduction — the explicit form of the
  * "runtime filter" every warehouse engine injects for selective joins:
  * when `dim` matches only a fraction of `fact`'s keys, a shuffle join
  * still moves EVERY fact row to the exchange first. Building a Bloom
  * filter over the dim keys and probing it on the fact side BEFORE the
  * exchange cuts shuffle volume to the semi-join footprint (+ the
  * false-positive rate, which costs bytes, never rows).
  *
  * Spark's own AQE variant (`spark.sql.optimizer.runtime.bloomFilter`)
  * fires only when its cost heuristics allow and inside one query; this
  * operator is the DETERMINISTIC, composable form — the caller knows the
  * dim is selective (a filtered date slice, a sampled benchmark set, a
  * decontamination list) and states it. At 100 TB the arithmetic is
  * stark: a 1%-selective dim on a 100 TB fact turns a ~100 TB exchange
  * into ~1 TB for the price of one dim-side aggregation and a
  * ~12-bit-per-key broadcast.
  *
  * Mechanics:
  *  - both sides reduce the (possibly composite) key to one 64-bit
  *    `xxhash64` — the SAME Column expression on build and probe, so
  *    they cannot drift; the Bloom kernel is [[FileBloom]]'s
  *    double-hashed splitmix64 (~0.3% FPR at 12 bits/key);
  *  - the build is distributed: per-partition bit arrays of one fixed
  *    size, OR-merged by `treeAggregate` (never a driver collect of
  *    keys), then broadcast once per executor;
  *  - the probe is a codegen'd expression ([[BloomProbeExpr]]) fused
  *    into the fact scan stage — filter-before-exchange, visible in the
  *    plan as a `bloom_probe` filter under the shuffle.
  */
object BloomJoin {

  private def keyHash(keys: Seq[String]): Column = xxhash64(keys.map(col): _*)

  /** Build one Bloom filter over `keys` of `dim` (distributed, OR-merged).
    * `expectedKeys` sizes the bit array (~12 bits/key); when absent, one
    * count job measures it. Returns (m bits, packed bytes). */
  def buildFilter(dim: DataFrame, keys: Seq[String], expectedKeys: Option[Long] = None): (Int, Array[Byte]) = {
    val spark = dim.sparkSession
    import spark.implicits._
    val n = expectedKeys.getOrElse(dim.count())
    val m = math.max(1024L, math.min(Int.MaxValue.toLong - 8, FileBloom.BitsPerKey * n)).toInt
    val nBytes = (m + 7) / 8
    val hashed = dim.select(keyHash(keys).as("h")).filter(col("h").isNotNull).as[Long]
    val bits = hashed.rdd.treeAggregate(new Array[Byte](nBytes))(
      seqOp = (acc, key) => { FileBloom.add(m, acc, key); acc },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }; a })
    (m, bits)
  }

  /** `fact` reduced to the rows whose key tuple MAY appear in `dim` —
    * the semi-join superset (exact up to Bloom false positives). Null
    * keys never match (inner-join semantics downstream). */
  def semiFilter(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      expectedKeys: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "at least one join key required")
    val (m, bits) = buildFilter(dim, keys, expectedKeys)
    val bc = fact.sparkSession.sparkContext.broadcast(bits)
    fact.filter(BloomProbeExpr(keyHash(keys), m, bc))
  }

  /** The reduced equi-join: probe-filter `fact` before the exchange, then
    * join exactly as `fact.join(dim, keys)` — same rows (the join clears
    * Bloom false positives), smaller shuffle. */
  def pruneAndJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      expectedKeys: Option[Long] = None): DataFrame =
    semiFilter(fact, dim, keys, expectedKeys).join(dim, keys)
}
