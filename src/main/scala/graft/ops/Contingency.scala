package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pearson chi-square independence audit for two categorical columns —
  * the quick screen for "is this metadata dimension independent of that
  * one" (language × source, label × shard): observed cell counts
  * against the independence expectation E = rowTotal·colTotal/N, with
  * each cell's χ² contribution (O−E)²/E.
  *
  * Scale shape: one keyed aggregation for the cells, two tiny keyed
  * aggregations for the margins, broadcast-sized joins back (margins
  * are |categories| rows). Expectation arithmetic keeps the exact
  * integer product rowTotal·colTotal in a long and divides by N in
  * double once, so contributions are cross-engine deterministic up to
  * the final rounding. */
object Contingency {

  /** @return (a, b, observed, expected, chi2_term) one row per observed
    *         cell. Σ chi2_term is the statistic; the per-cell view
    *         shows WHERE the dependence lives. */
  def chi2(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("observed"))
    val rowTot = cells.groupBy("a").agg(sum("observed").as("a_total"))
    val colTot = cells.groupBy("b").agg(sum("observed").as("b_total"))
    val n = cells.agg(sum("observed")).collect()(0).getLong(0)
    cells
      .join(rowTot, "a")
      .join(colTot, "b")
      .select(
        col("a"), col("b"), col("observed"),
        ((col("a_total") * col("b_total")).cast("double") / lit(n.toDouble))
          .as("expected"))
      .withColumn("chi2_term",
        (col("observed") - col("expected")) * (col("observed") - col("expected"))
          / col("expected"))
  }

  /** Welch's unequal-variance two-sample t-test — "do these two slices of
    * the corpus differ in this metric" (source A vs source B document
    * length, shard vs shard quality score) without assuming equal
    * variances or sizes.
    *
    * One row out: counts, means, the t statistic, and the
    * Welch–Satterthwaite degrees of freedom. Scale shape: a single
    * conditional aggregation pass over the filtered input — six scalar
    * aggregates in one whole-stage-codegen HashAggregate, no join, no
    * second scan. */
  def welchT(
      df: DataFrame, groupCol: String, valueCol: String,
      g1: String, g2: String): DataFrame = {
    def side(g: String, f: (org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      f(when(col(groupCol) === g, col(valueCol).cast("double")))
    val agg = df
      .filter(col(groupCol).isin(g1, g2) && col(valueCol).isNotNull)
      .agg(
        side(g1, count).as("n1"), side(g2, count).as("n2"),
        side(g1, avg).as("mean1"), side(g2, avg).as("mean2"),
        side(g1, var_samp).as("var1"), side(g2, var_samp).as("var2"))
    val se1 = col("var1") / col("n1")
    val se2 = col("var2") / col("n2")
    val se = se1 + se2
    agg.select(
      col("n1"), col("n2"), col("mean1"), col("mean2"),
      ((col("mean1") - col("mean2")) / sqrt(se)).as("t_stat"),
      ((se * se) / (se1 * se1 / (col("n1") - 1) + se2 * se2 / (col("n2") - 1)))
        .as("dof"))
  }
}
