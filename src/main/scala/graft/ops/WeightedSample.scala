package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weight-proportional sampling — the curation step
  * between scoring and packing: "keep k documents per source, preferring
  * high quality, but sample rather than top-k so the tail keeps
  * coverage". Top-k by score alone collapses a source to its single
  * template; uniform sampling ignores quality; weighted sampling is the
  * published middle ground (quality-weighted subsampling).
  *
  * Algorithm: Efraimidis–Spiliopoulos (2006) reservoir keys — each row
  * draws u ∈ (0,1) and ranks by u^(1/w); the top k per group are a true
  * weight-proportional sample WITHOUT replacement. The draw is a
  * DETERMINISTIC hash-uniform of (salt, id) — the same property the
  * hash split (q110) has: reproducible across runs AND engines (the
  * oracle replays it in SQL), stable under corpus growth (a new row
  * never changes an existing row's key; it can only displace it by
  * out-ranking it), and embarrassingly parallel.
  *
  * Scale shape: one expression computes the key (md5 → 32-bit uniform →
  * pow), one PARTITIONED window ranks within groups (never a global
  * window), nothing else moves. Rows with NULL or non-positive weight
  * are excluded (they have no defined sampling probability).
  */
object WeightedSample {

  private val Denom = math.pow(16, 8) + 1 // 8 hex digits + 1 => u in (0,1)

  /** The ES reservoir key u^(1/w) for (salt, id, weight). */
  private[graft] def esKey(idCol: Column, weightCol: Column, salt: String): Column = {
    val u = (conv(substring(md5(concat(lit(s"$salt:"), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("double") + 1) / lit(Denom)
    pow(u, lit(1.0) / weightCol.cast("double"))
  }

  /** At most `k` rows per group, sampled weight-proportionally without
    * replacement; ties (astronomically unlikely but hash-possible) break
    * on `idCol` for full determinism. Returns the input columns. */
  def kPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "ws-v1"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(groupCols.nonEmpty, "at least one group column required")
    val key = esKey(col(idCol), col(weightCol), salt)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(key.desc, col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
