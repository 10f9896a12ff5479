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

  /** Sample-ratio-mismatch (SRM) check — the assignment-integrity gate
    * every experimentation platform runs BEFORE reading any metric: a
    * chi-square goodness-of-fit of the observed arm counts against the
    * DECLARED allocation. A randomizer bug, a bot filter that eats one
    * arm, or a logging drop skews the split, and every downstream
    * comparison (q269/q340/q346/q349) silently inherits the selection
    * bias — the standard alarm threshold is p < 0.001 (Fabijan et al.
    * 2019), deliberately strict because assignment is supposed to be
    * EXACTLY right.
    *
    * Scale shape: one keyed aggregation over the subject frame (arm
    * grid out), a broadcast join against the declared ratios, and
    * grid-sized arithmetic — no data-sized collect (the undeclared-arm
    * probe is a limit-3 collect, the [[SequentialTest]] refusal
    * discipline). The chi-square upper-tail p uses the Wilson-Hilferty
    * cube-root normalization and the SAME fixed A&S 7.1.26 polynomial
    * as the rest of the p-value family — deterministic in both engines,
    * any dof.
    *
    * @param expected declared (arm, ratio) allocation; ratios must sum
    *                 to 1. An OBSERVED arm missing from the declaration
    *                 refuses (that IS the config/logging bug SRM exists
    *                 to catch); a declared arm with zero observed rows
    *                 counts as 0 and inflates χ² — as it should. */
  def srm(df: DataFrame, armCol: String,
      expected: Seq[(String, Double)]): DataFrame = {
    require(expected.size >= 2, "srm needs at least two declared arms")
    require(math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      s"declared ratios must sum to 1, got ${expected.map(_._2).sum}")
    require(expected.forall(_._2 > 0.0), "declared ratios must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val decl = expected.toDF("arm", "ratio")
    val counts = df.groupBy(col(armCol).cast("string").as("arm"))
      .agg(count(lit(1)).as("obs"))
    val undeclared = counts.join(broadcast(decl), Seq("arm"), "left_anti")
      .select("arm").limit(3).collect().map(_.getString(0))
    require(undeclared.isEmpty,
      s"observed arms not in the declared allocation: ${undeclared.mkString(", ")} — " +
        "an undeclared arm IS the assignment bug SRM exists to catch; declare it " +
        "or fix the randomizer")
    val grid = broadcast(decl).join(counts, Seq("arm"), "left")
      .na.fill(0L, Seq("obs"))
    val tot = grid.agg(sum("obs").as("n"), count(lit(1)).as("k"))
    val terms = grid.crossJoin(broadcast(tot))
      .withColumn("exp_n", col("n").cast("double") * col("ratio"))
      .withColumn("term",
        (col("obs") - col("exp_n")) * (col("obs") - col("exp_n")) / col("exp_n"))
    val agg = terms.agg(
      first("n").as("n"), first("k").as("k"), sum("term").as("chi2"))
    val pUpper = chi2UpperP(col("chi2"), (col("k") - 1).cast("double"))
    agg.select(
      col("n"), (col("k") - 1).as("dof"), col("chi2"),
      pUpper.as("p_srm"),
      (pUpper < 0.001).as("srm"))
  }

  /** Chi-square upper-tail p for any dof: Wilson-Hilferty cube-root
    * normalization (χ²/ν)^(1/3) ≈ N(1 − 2/(9ν), 2/(9ν)), then the same
    * fixed A&S 7.1.26 polynomial as the rest of the p-value family —
    * deterministic in both engines, accurate where the alarm tail lives
    * (its LEFT tail at 1 dof is soft: p(0) ≈ 0.95, not 1 — spec-noted). */
  private[graft] def chi2UpperP(
      chi2: org.apache.spark.sql.Column,
      nu: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val z = (pow(chi2 / nu, 1.0 / 3.0) - (lit(1.0) - lit(2.0) / (lit(9.0) * nu))) /
      sqrt(lit(2.0) / (lit(9.0) * nu))
    val pTwo = graft.queries.Stats.pNormTwoSided(z)
    when(z >= 0, pTwo / 2.0).otherwise(lit(1.0) - pTwo / 2.0)
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
