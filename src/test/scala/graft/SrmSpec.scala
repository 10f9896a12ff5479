package graft

import graft.ops.Contingency

/** Contract of [[Contingency.srm]]: hand-computed chi-square values, the
  * p < 0.001 alarm firing exactly when it should, multi-arm uneven
  * allocations, and the declared refusals. */
class SrmSpec extends SparkSuite {
  import spark.implicits._

  private val half = Seq("a" -> 0.5, "b" -> 0.5)

  test("balanced 50/50 split: tiny chi2, no alarm; mild skew crosses p≈0.05 but not the alarm") {
    val balanced = (1 to 10000).map(i => Tuple1(if (i % 2 == 0) "a" else "b"))
      .toDF("arm")
    val r = Contingency.srm(balanced, "arm", half).head
    assert(r.getAs[Double]("chi2") < 1e-9)
    // WH is built for the UPPER tail (where the alarm lives); at 1 dof
    // its left-tail p for chi2=0 is ~0.95, not 1.0 — fine for SRM
    assert(r.getAs[Double]("p_srm") > 0.9)
    assert(!r.getAs[Boolean]("srm"))
    // 5100 vs 4900 on declared 50/50: chi2 = 2·100²/5000 = 4.0 exactly;
    // the 1-dof upper tail is ≈ 0.0455 — suspicious, NOT an SRM alarm
    val mild = ((1 to 5100).map(_ => "a") ++ (1 to 4900).map(_ => "b"))
      .map(Tuple1(_)).toDF("arm")
    val m = Contingency.srm(mild, "arm", half).head
    assert(math.abs(m.getAs[Double]("chi2") - 4.0) < 1e-9)
    assert(m.getAs[Double]("p_srm") > 0.03 && m.getAs[Double]("p_srm") < 0.06,
      s"WH p for chi2=4, dof=1 should be ≈0.0455, got ${m.getAs[Double]("p_srm")}")
    assert(!m.getAs[Boolean]("srm"))
  }

  test("a real ratio mismatch fires the p<0.001 alarm") {
    // 5300 vs 4700: chi2 = 2·300²/5000 = 36 → p ~ 1e-9
    val skewed = ((1 to 5300).map(_ => "a") ++ (1 to 4700).map(_ => "b"))
      .map(Tuple1(_)).toDF("arm")
    val r = Contingency.srm(skewed, "arm", half).head
    assert(math.abs(r.getAs[Double]("chi2") - 36.0) < 1e-9)
    assert(r.getAs[Double]("p_srm") < 1e-6)
    assert(r.getAs[Boolean]("srm"))
    // a declared arm that logged ZERO rows is the worst mismatch of all
    val oneSided = (1 to 100).map(_ => Tuple1("a")).toDF("arm")
    val o = Contingency.srm(oneSided, "arm", half).head
    assert(math.abs(o.getAs[Double]("chi2") - 100.0) < 1e-9,
      "all-one-arm chi2 must equal N")
    assert(o.getAs[Boolean]("srm"))
  }

  test("multi-arm uneven allocation: exact counts give chi2 0; dof = k−1") {
    val alloc = Seq("a" -> 0.4, "b" -> 0.3, "c" -> 0.2, "d" -> 0.1)
    val exact = (alloc.flatMap { case (arm, ratio) =>
      (1 to (1000 * ratio).toInt * 10).map(_ => arm)
    }).map(Tuple1(_)).toDF("arm")
    val r = Contingency.srm(exact, "arm", alloc).head
    assert(r.getAs[Long]("dof") == 3)
    assert(r.getAs[Double]("chi2") < 1e-9)
    assert(r.getAs[Double]("p_srm") > 0.99 && !r.getAs[Boolean]("srm"))
  }

  test("refusals: undeclared observed arm named; bad ratio declarations") {
    val df = Seq("a", "b", "mystery").map(Tuple1(_)).toDF("arm")
    val e1 = intercept[IllegalArgumentException](
      Contingency.srm(df, "arm", half))
    assert(e1.getMessage.contains("mystery"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Contingency.srm(df, "arm", Seq("a" -> 0.6, "b" -> 0.6)))
    assert(e2.getMessage.contains("sum to 1"))
    val e3 = intercept[IllegalArgumentException](
      Contingency.srm(df, "arm", Seq("a" -> 1.0)))
    assert(e3.getMessage.contains("two"))
  }
}
