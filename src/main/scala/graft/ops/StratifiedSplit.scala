package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT-count stratified splitting: within every stratum, exactly
  * ⌊fTrain·n⌋ rows go to train and ⌊(fTrain+fVal)·n⌋−⌊fTrain·n⌋ to val
  * (remainder test) — the release contract q110's hash split can only
  * meet in expectation (a ±√n miss per stratum is routine there, and
  * small strata can land entire splits empty).
  *
  * Shape (scale-safe, no per-stratum window): the membership draw is the
  * q141 48-bit md5 prefix — uniform, deterministic, corpus-order
  * independent — so range-bucketing the draw into `spark.sql.shuffle.
  * partitions` equal intervals balances by construction. Rows rank
  * locally per (stratum, bucket); per-(stratum, bucket) counts form a
  * strata×buckets offset table (O(cluster), not O(data)) whose
  * cumulative offsets stitch local ranks into exact per-stratum ranks.
  * One data shuffle on (stratum, bucket), one bounded-table window, one
  * broadcast join back.
  *
  * Docs added later shift ranks (exactness is a per-snapshot contract);
  * for growth-stable membership use the q110/q225 hash split instead —
  * the two are complementary, which is why both exist.
  */
object StratifiedSplit {

  /** 48-bit uniform draw, identical arithmetic to q141's epoch shuffle. */
  private def draw(idCol: Column, seed: String): Column =
    conv(substring(md5(concat(lit(s"$seed:"), idCol.cast("string"))), 1, 12), 16, 10)
      .cast("long")

  /** Weight-boundary variant: the split cut is on cumulative WEIGHT
    * (token budget — "train gets 80% of the tokens", the boundary LLM
    * mixes are actually specified in), not row count. A row joins train
    * while the weight accumulated BEFORE it is under fTrain·W, so each
    * boundary is crossed by exactly one row and the train share misses
    * fTrain·W by less than one document's weight. Same bucket-stitched
    * shape as [[assign]] with per-bucket weight sums as the offsets. */
  def assignByWeight(
      df: DataFrame, idCol: String, stratumCol: String, weightCol: String,
      fTrain: Double, fVal: Double, seed: String = "strat-v1"): DataFrame = {
    require(fTrain >= 0 && fVal >= 0 && fTrain + fVal <= 1.0, "bad fractions")
    val spark = df.sparkSession
    val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt.max(1)
    val width = (1L << 48) / buckets + 1
    val d = draw(col(idCol), seed)
    val w = col(weightCol).cast("double")
    val bucketed = df.withColumn("_drw", d).withColumn("_bkt", (d / width).cast("int"))

    val lw = Window.partitionBy(col(stratumCol), col("_bkt"))
      .orderBy(col("_drw"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("_lcw", coalesce(sum(w).over(lw), lit(0.0)))

    val counts = bucketed.groupBy(col(stratumCol), col("_bkt"))
      .agg(sum(w).as("_wsum"))
    val ow = Window.partitionBy(col(stratumCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_wsum")).over(ow), lit(0.0)))
      .withColumn("_tot", sum(col("_wsum")).over(Window.partitionBy(col(stratumCol))))
      .select(col(stratumCol), col("_bkt"), col("_off"), col("_tot"))

    local.join(broadcast(offsets), Seq(stratumCol, "_bkt"))
      .withColumn("_cum", col("_off") + col("_lcw")) // weight BEFORE this row
      .withColumn(
        "split",
        when(col("_cum") < lit(fTrain) * col("_tot"), "train")
          .when(col("_cum") < lit(fTrain + fVal) * col("_tot"), "val")
          .otherwise("test"))
      .drop("_drw", "_bkt", "_lcw", "_off", "_tot", "_cum")
  }

  /** Input plus a `split` column ∈ train | val | test, with exact
    * per-stratum counts. `fTrain + fVal` must be ≤ 1; test takes the
    * remainder. */
  def assign(
      df: DataFrame, idCol: String, stratumCol: String,
      fTrain: Double, fVal: Double, seed: String = "strat-v1"): DataFrame = {
    require(fTrain >= 0 && fVal >= 0 && fTrain + fVal <= 1.0, "bad fractions")
    val spark = df.sparkSession
    val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt.max(1)
    val width = (1L << 48) / buckets + 1
    val d = draw(col(idCol), seed)
    val bucketed = df.withColumn("_drw", d).withColumn("_bkt", (d / width).cast("int"))

    val lw = Window.partitionBy(col(stratumCol), col("_bkt"))
      .orderBy(col("_drw"), col(idCol))
    val local = bucketed.withColumn("_lrn", row_number().over(lw))

    // strata × buckets rows — bounded by the cluster, not the data
    val counts = bucketed.groupBy(col(stratumCol), col("_bkt"))
      .agg(count(lit(1)).as("_n"))
    val ow = Window.partitionBy(col(stratumCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(ow), lit(0L)))
      .withColumn("_tot", sum(col("_n")).over(Window.partitionBy(col(stratumCol))))
      .select(col(stratumCol), col("_bkt"), col("_off"), col("_tot"))

    local.join(broadcast(offsets), Seq(stratumCol, "_bkt"))
      .withColumn("_rank", col("_off") + col("_lrn"))
      .withColumn(
        "split",
        when(col("_rank") <= floor(lit(fTrain) * col("_tot")), "train")
          .when(col("_rank") <= floor(lit(fTrain + fVal) * col("_tot")), "val")
          .otherwise("test"))
      .drop("_drw", "_bkt", "_lrn", "_off", "_tot", "_rank")
  }
}
