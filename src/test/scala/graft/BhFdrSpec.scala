package graft

import org.apache.spark.sql.functions._

/** The q326 BH-FDR building blocks: the Abramowitz-Stegun normal-CDF
  * polynomial's accuracy at the textbook points, and the BH decision on
  * a hand-solved p-value set. */
class BhFdrSpec extends SparkSuite {
  import spark.implicits._

  test("A&S two-sided p matches textbook normal quantiles to 1e-6") {
    val zs = Seq(0.0, 1.0, 1.644853626951, 1.959963984540054, 2.575829303549, 3.0)
    val expected = Seq(1.0, 0.3173105078629141, 0.10, 0.05, 0.01, 0.0026997960632601866)
    val got = zs.toDF("z")
      .select(graft.queries.Stats.pNormTwoSided(col("z")).as("p"))
      .collect().map(_.getDouble(0))
    got.zip(expected).zip(zs).foreach { case ((g, e), z) =>
      assert(math.abs(g - e) < 2e-7, s"p($z): got $g want $e")
    }
  }

  test("BH picks k* = max{k : p_(k) <= a*k/m}, not the naive threshold") {
    // hand case, m = 5, alpha = 0.05: sorted p = .005, .011, .02, .04, .9
    // thresholds:                              .01,  .02,  .03, .04, .05
    // p_(2)=.011 > .02? no, .011 <= .02 ok; p_(4)=.04 <= .04 ok -> k*=4:
    // ALL of the first four are discoveries, including p_(2) (which a
    // step-down reading would keep) and p_(4)=.04 (which naive per-test
    // alpha=.01 Bonferroni would drop)
    val ps = Seq(0.005, 0.011, 0.02, 0.04, 0.9)
    val kstar = ps.sorted.zipWithIndex
      .filter { case (p, i) => p <= 0.05 * (i + 1) / ps.size }
      .map(_._2 + 1).maxOption.getOrElse(0)
    assert(kstar == 4)
    // the same arithmetic the query's window form computes
    val df = ps.toDF("pv")
      .withColumn("k", row_number().over(
        graft.core.Windows.bounded(col("pv"))))
      .withColumn("kstar", coalesce(
        max(when(col("pv") <= lit(0.05) * col("k") / lit(ps.size), col("k")))
          .over(graft.core.Windows.bounded(col("pv")).rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)),
        lit(0L)))
    val flags = df.select(col("pv"), (col("k") <= col("kstar")).as("d"))
      .collect().map(r => r.getDouble(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(0.005 -> true, 0.011 -> true, 0.02 -> true,
      0.04 -> true, 0.9 -> false))
  }
}
