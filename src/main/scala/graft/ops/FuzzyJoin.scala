package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join without a cross product — entity
  * resolution over names/titles/URLs at corpus scale.
  *
  * Blocking is the deletion neighborhood (the publicly documented
  * SymSpell scheme): each string emits itself plus every single-character
  * deletion. For edit distance ≤ 1 this is COMPLETE, not heuristic —
  *   - substitution at position i: both sides' delete-at-i variants are
  *     equal;
  *   - insertion/deletion: the shorter string IS a deletion variant of
  *     the longer, and every string emits itself;
  *   - equal strings collide on themselves —
  * so every qualifying pair shares a variant key, the same
  * candidates→verify shape as the LSH dedup pipeline, and `levenshtein`
  * verification only prunes false candidates (variant collisions of
  * unrelated strings). Cost: |s|+1 variant rows per string, keyed
  * shuffles only; degenerate variant buckets are capped like LSH band
  * buckets. (d=2 would block on double deletions — same construction.)
  */
object FuzzyJoin {

  /** The string itself + all single-character deletions (distinct). The
    * per-character lambda is interpreted — fine off the bench hot path;
    * the fused-expression route (ShingleHashSetExpr's pattern) applies if
    * this ever fronts a 100 TB pass. */
  private def deletionVariants(s: Column): Column =
    array_distinct(concat(
      array(s),
      transform(
        sequence(lit(0), length(s) - 1),
        i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s))))))

  /** All pairs (a_key < b_key) with edit distance ≤ 1, exact `dist`.
    * Output: (a_key, b_key, dist) — deterministic. */
  def editDistance1Pairs(
      df: DataFrame, keyCol: String, strCol: String, maxBucket: Int = 1000): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(strCol).as("s"))
    val variants = base.select(col("k"), explode(deletionVariants(col("s"))).as("v"))
    // Pairs form inside each variant bucket (one shuffle keyed on the
    // variant); buckets past the cap are near-universal variants carrying
    // ~no signal, exactly the LSH bucket-cap argument.
    val buckets = variants.groupBy("v").agg(collect_set(col("k")).as("ks"))
      .filter(size(col("ks")).between(2, maxBucket))
    val candidates = buckets
      .select(explode(col("ks")).as("a_k"), col("ks"))
      .select(col("a_k"), explode(col("ks")).as("b_k"))
      .filter(col("a_k") < col("b_k"))
      .dropDuplicates("a_k", "b_k")
    candidates
      .join(base.select(col("k").as("a_k"), col("s").as("a_s")), Seq("a_k"))
      .join(base.select(col("k").as("b_k"), col("s").as("b_s")), Seq("b_k"))
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")))
      .filter(col("dist") <= 1)
      .select(col("a_k"), col("b_k"), col("dist"))
  }
}
