package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture epoch weighting — the curation step that up-samples
  * high-quality sources and down-samples bulk crawl before training
  * (every published pretraining mix does a version of this).
  */
object Mixing {

  /** Repeat each row `weight` times, tagging the copy index as `epoch`
    * (1-based). A weight of 0 (or negative) drops the row — so one column
    * expresses both up-sampling and filtering. Narrow op: no shuffle; the
    * blow-up is bounded by the max weight, and rows stay on their input
    * partitions (downstream shuffles see the mixed distribution, which is
    * the point). Fractional weights → [[byFractionalWeight]]; this
    * integer path is the oracle-checked exact one (q103). */
  def byWeight(df: DataFrame, weight: Column, epochName: String = "epoch"): DataFrame = {
    val w = weight.cast("int")
    // NOT sequence(1, w) bare: Spark's sequence REVERSES when stop < start
    // (sequence(1, 0) = [1, 0]), so weight 0 must map to an explicit empty
    // array, which (non-outer) explode then drops.
    df.withColumn(epochName,
      explode(when(w >= 1, sequence(lit(1), w)).otherwise(array().cast("array<int>"))))
  }

  /** Fractional epoch weighting: weight 2.3 yields every row twice, plus a
    * third copy for a deterministic ~30% of rows. The fractional remainder
    * is a per-row seeded hash coin (`xxhash64(idCol, seed)` mapped to
    * [0,1)), NOT `rand()` — so the mix is reproducible run-to-run and
    * row-stable (the same document always gets the same extra-epoch
    * decision, which is what makes pipeline re-runs diffable). Still a
    * narrow op: no shuffle, no sampling pass; the coin is one hash per
    * row. Copies tag `epoch` 1-based; the probabilistic copy is the last
    * epoch. Weights <= 0 drop the row, matching [[byWeight]]. */
  def byFractionalWeight(
      df: DataFrame, weight: Column, idCol: Column,
      seed: Long = 42L, epochName: String = "epoch"): DataFrame = {
    val w = weight.cast("double")
    val whole = floor(w).cast("int")
    // xxhash64 → [0,1): shift to 53-bit non-negative mantissa range, the
    // standard double-from-bits construction (collision-free precision)
    val coin = (shiftrightunsigned(xxhash64(idCol, lit(seed)), 11)
      .cast("double") / lit((1L << 53).toDouble))
    val copies = (whole + when(coin < (w - whole.cast("double")), 1).otherwise(0))
      .cast("int")
    df.withColumn(epochName,
      explode(when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** [[byFractionalWeight]] with a PORTABLE coin: the md5-uniform the
    * split/sampling family uses (u = first 8 md5 hex digits of
    * `salt:id` / 2³²) instead of the Spark-specific xxhash64 — exactly
    * reproducible in any engine with md5, which upgrades fractional
    * mixing from rows-only to oracle-checked (q244 replays the identical
    * arithmetic in DuckDB). Same contract otherwise: weight 2.3 = two
    * full epochs + a third for the deterministic ~30% of ids whose coin
    * lands under the remainder; weights ≤ 0 drop the row; still a narrow
    * zero-shuffle op (one md5 per row). */
  def byFractionalWeightPortable(
      df: DataFrame, weight: Column, idCol: Column,
      salt: String = "mix-v1", epochName: String = "epoch"): DataFrame = {
    val w = weight.cast("double")
    val whole = floor(w).cast("int")
    val coin = conv(
      substring(md5(concat(lit(s"$salt:"), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val copies = (whole + when(coin < (w - whole.cast("double")), 1).otherwise(0))
      .cast("int")
    df.withColumn(epochName,
      explode(when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * sampling rule (mC4, PaLM, BLOOM): sample source i with probability
    * `p_i ∝ n_i^α`, α ∈ (0, 1] flattening the natural size distribution so
    * small sources are not drowned out (α = 1 recovers proportional
    * sampling, α → 0 uniform). Given a per-row size measure (token count)
    * and a total token budget, emits one row per source:
    * `(group, n_tokens, p` — the α-scaled sampling probability — `, epochs`
    * — how many passes over the source the budget implies, the number that
    * feeds [[byFractionalWeight]]`)`.
    *
    * Scale shape: ONE group-keyed aggregation (map-side combined); the
    * normalizer is a one-row aggregate over the groups-sized result,
    * broadcast back. Nothing here ever touches rows again — the output is
    * GROUPS-sized, the natural input to an epoch-weighting pass. */
  def temperatureWeights(
      df: DataFrame, groupCol: String, sizeCol: Column,
      alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val counts = df.groupBy(col(groupCol))
      .agg(sum(sizeCol.cast("long")).as("n_tokens"))
    val z = counts.agg(
      sum(pow(col("n_tokens").cast("double"), lit(alpha))).as("_z"))
    counts.crossJoin(broadcast(z))
      .select(
        col(groupCol),
        col("n_tokens"),
        (pow(col("n_tokens").cast("double"), lit(alpha)) / col("_z")).as("p"),
        (pow(col("n_tokens").cast("double"), lit(alpha)) / col("_z") *
          lit(budgetTokens.toDouble) / col("n_tokens").cast("double")).as("epochs"))
  }
}
