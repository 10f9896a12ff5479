package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit for data releases (Sweeney 2002): every row must be
  * indistinguishable from at least k−1 others on its quasi-identifier
  * (QI) columns — the combination an adversary could join against an
  * external dataset (demographics, account bands, region). Training-data
  * releases run the same audit before publishing metadata sidecars.
  *
  * Scale shape: [[audit]] is ONE keyed aggregation on the QI tuple (the
  * equivalence-class table is bounded by the QI domain product, not the
  * row count); [[suppress]] adds one semi-join back on the same key — at
  * 100 TB the class table is usually small enough that AQE broadcasts
  * it, and when it isn't, the join is the keyed shuffle both sides
  * already hash on. No windows, no row-count-sized state.
  */
object KAnonymity {

  /** Equivalence classes over `qiCols`: one row per distinct QI
    * combination with its population `n` and `anonymous = n >= k`. */
  def audit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** Drop every row whose QI equivalence class has fewer than k members
    * (suppression — the conservative release strategy; generalization is
    * the caller's domain-specific alternative). */
  def suppress(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    df.join(
      audit(df, qiCols, k).filter(col("anonymous")).select(qiCols.map(col): _*),
      qiCols,
      "left_semi")

  /** l-diversity audit (Machanavajjhala 2007) — the attack k-anonymity
    * misses: a class can be large yet have ONE sensitive value, so
    * membership alone discloses it (homogeneity attack). Every QI class
    * must carry at least l DISTINCT sensitive values. Same one-keyed-
    * aggregation shape as [[audit]] (count distinct rides the same
    * grouped pass); classes bounded by the QI domain, not row count. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, "l must be positive")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }
}
