package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heterogeneous-treatment-effect screen: does the experiment's lift
  * DIFFER across segments, or is the pooled number the whole story? The
  * standard tool is the fixed-effect meta-analysis pair: the
  * inverse-variance pooled effect δ̄ = Σwᵢδᵢ/Σwᵢ (wᵢ = 1/var(δᵢ)) and
  * Cochran's Q = Σwᵢ(δᵢ − δ̄)² ~ χ²(k−1) under homogeneity, with
  * I² = max(0, (Q − dof)/Q) as the share of cross-segment variance that
  * is real heterogeneity rather than sampling noise. A significant Q
  * means "do not ship the pooled lift as THE number — it differs by
  * segment"; reading per-segment lifts without this gate is how
  * subgroup fishing ships.
  *
  * Scale shape: ONE conditional keyed aggregation to the segment grid
  * (per segment: n/conversions per arm), then grid-sized column
  * arithmetic and one tiny aggregation — no data-sized collect. The
  * guards (exactly two arms; every segment carries both arms) are
  * limit-3 collects, the [[SequentialTest]] refusal discipline. The
  * chi-square upper-tail p is the shared Wilson-Hilferty + A&S path
  * ([[Contingency.chi2UpperP]]). */
object Hte {

  /** One row: (k, pooled_delta, q_stat, dof, p_homogeneity, i2,
    * heterogeneous) for a two-arm conversion experiment read across
    * `segmentCol`. `convCol` must be 0/1 per subject; `heterogeneous`
    * fires at the conventional p < 0.05. */
  def homogeneity(
      subjects: DataFrame, segmentCol: String, armCol: String, convCol: String,
      focal: String): DataFrame = {
    val spark = subjects.sparkSession
    val arms = subjects.select(col(armCol).cast("string").as("arm"))
      .distinct().limit(3).collect().map(_.getString(0))
    require(arms.length == 2,
      s"homogeneity is a two-arm analysis, got ${arms.length} arms: " +
        arms.sorted.mkString(", "))
    require(arms.contains(focal), s"focal arm '$focal' not present in $armCol")
    // one segment means zero heterogeneity dof — Q is identically 0 and
    // p would be the 0/0 NaN; refuse like every other degenerate design
    val segs = subjects.select(col(segmentCol).cast("string").as("s"))
      .distinct().limit(2).collect()
    require(segs.length >= 2,
      s"homogeneity needs at least two segments in $segmentCol (k - 1 dof); " +
        "a single segment has no cross-segment contrast to test")
    val isF = col(armCol).cast("string") === focal
    val grid = subjects
      .groupBy(col(segmentCol).cast("string").as("segment"))
      .agg(
        sum(when(isF, 1L).otherwise(0L)).as("n_f"),
        sum(when(isF, col(convCol).cast("long")).otherwise(0L)).as("s_f"),
        sum(when(!isF, 1L).otherwise(0L)).as("n_c"),
        sum(when(!isF, col(convCol).cast("long")).otherwise(0L)).as("s_c"))
    // conv outside 0/1 makes rates leave [0,1] and variance go negative —
    // refuse by name rather than let a count-metric masquerade as a rate
    val nonBinary = grid.filter(
      col("s_f") < 0 || col("s_f") > col("n_f") ||
        col("s_c") < 0 || col("s_c") > col("n_c"))
      .select("segment").limit(3).collect().map(_.getString(0))
    require(nonBinary.isEmpty,
      s"convCol must be 0/1 per subject (segment(s) ${nonBinary.mkString(", ")} sum " +
        "past their subject counts) — a count-valued metric belongs in the " +
        "t/CUPED family, not a rate contrast")
    // a segment missing an arm has no within-segment contrast — that is
    // a design/logging defect, not a zero: refuse naming it
    val oneArmed = grid.filter(col("n_f") === 0 || col("n_c") === 0)
      .select("segment").limit(3).collect().map(_.getString(0))
    require(oneArmed.isEmpty,
      s"segment(s) missing an arm: ${oneArmed.mkString(", ")} — a one-armed " +
        "segment has no within-segment effect; fix the assignment or drop it knowingly")
    val pF = col("s_f").cast("double") / col("n_f")
    val pC = col("s_c").cast("double") / col("n_c")
    val varI = pF * (lit(1.0) - pF) / col("n_f") + pC * (lit(1.0) - pC) / col("n_c")
    // a zero-variance segment (all-0 or all-1 in BOTH arms) carries no
    // sampling noise to weight by; its weight is undefined — refuse too
    val degenerate = grid.filter(varI <= 0.0)
      .select("segment").limit(3).collect().map(_.getString(0))
    require(degenerate.isEmpty,
      s"segment(s) with zero effect variance (degenerate 0%/100% rates in both " +
        s"arms): ${degenerate.mkString(", ")} — inverse-variance weights are " +
        "undefined; coarsen the segmentation")
    val weighted = grid.select(
      (pF - pC).as("delta"), (lit(1.0) / varI).as("w"))
    val pooled = weighted.agg(
      count(lit(1)).as("k"),
      sum(col("w") * col("delta")).as("swd"),
      sum("w").as("sw"),
      sum(col("w") * col("delta") * col("delta")).as("swd2"))
    // Q = Σw·δ² − (Σw·δ)²/Σw  (the one-pass form of Σw(δ − δ̄)²)
    val q = col("swd2") - col("swd") * col("swd") / col("sw")
    val dof = (col("k") - 1).cast("double")
    val p = Contingency.chi2UpperP(q, dof)
    pooled.select(
      col("k"),
      (col("swd") / col("sw")).as("pooled_delta"),
      q.as("q_stat"),
      (col("k") - 1).as("dof"),
      p.as("p_homogeneity"),
      // q = 0 (identical per-segment effects) means zero heterogeneity —
      // guard the ratio (ANSI division) rather than relying on ±inf
      when(q > 0, greatest(lit(0.0), (q - dof) / q)).otherwise(lit(0.0)).as("i2"),
      (p < 0.05).as("heterogeneous"))
  }
}
