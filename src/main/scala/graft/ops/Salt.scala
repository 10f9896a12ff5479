package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY.md §6 / the 100 TB design point).
  *
  * AQE's skew-join splitting handles most runtime skew; these helpers are
  * for the planned-skew cases AQE can't fix — a single hot grouping key
  * whose partial aggregate still overwhelms one reducer, or a hot join key
  * against a replicable right side. Keys may be composite (`Seq[String]`):
  * real star schemas join on multi-column keys routinely, and a hot
  * composite key must spread exactly like a hot scalar one.
  */
object Salt {

  /** Two-phase salted aggregation: spread each key over `buckets` partial
    * groups, aggregate, then combine. Supports the decomposable aggregates
    * (sum/count here; min/max/avg follow the same shape). Result is
    * identical to a direct `groupBy(keys).agg(sum, count)`. The salt comes
    * from the row position, NOT the value column — a hot key with constant
    * values (the classic counter-skew shape) must still spread.
    */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))

  def saltedSumCount(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame =
    saltedSumCount(df, Seq(key), valueCol, buckets)

  /** Salted equi-join for a skewed left side against a small-ish right
    * side: left rows get a salt in [0, buckets); the right side is
    * replicated once per salt so every (keys..., salt) tuple still
    * matches. Row multiplicity is unchanged; right side grows x buckets
    * (keep it the dimension side).
    */
  def saltedJoin(
      skewed: DataFrame, dim: DataFrame, keys: Seq[String], buckets: Int): DataFrame = {
    val saltedLeft = skewed.withColumn(
      "__salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val replicatedRight = dim.withColumn(
      "__salt", explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }

  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame =
    saltedJoin(skewed, dim, Seq(key), buckets)
}
