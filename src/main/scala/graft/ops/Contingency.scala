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
}
