package graft

import org.apache.spark.sql.functions._

/** Targeted checks for q275 (RRF hybrid retrieval) and q276 (Benford
  * first-digit audit) beyond the DuckDB oracle: the fusion arithmetic is
  * re-derived from the reported ranks, and the digit histogram is
  * recomputed independently on the driver via BigDecimal rendering (a
  * different code path from the engine's round→cast→substring chain).
  */
class RrfBenfordSpec extends SparkSuite {

  test("q275: rrf equals the published formula over the reported ranks") {
    val rows = SparkEntry.queries("q275_rrf_hybrid")(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rl = r.getAs[Int]("r_lex")
      val rs = r.getAs[Int]("r_sem")
      assert(rl >= 0 && rl <= 20 && rs >= 0 && rs <= 20)
      assert(rl > 0 || rs > 0, "a fused row must appear in at least one branch")
      val expected = BigDecimal(
        (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
          (if (rs > 0) 1.0 / (60 + rs) else 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 1e-9,
        s"rrf mismatch at ranks ($rl, $rs)")
    }
    // descending fused order with doc_id tie-break
    val key = rows.map(r => (-r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(key.sameElements(key.sorted), "result not ordered by (rrf desc, doc_id)")
  }

  test("q275: each branch rank list is 1..k without repeats") {
    val rows = SparkEntry.queries("q275_rrf_hybrid")(spark, sf0001).collect()
    Seq("r_lex", "r_sem").foreach { c =>
      val ranks = rows.map(_.getAs[Int](c)).filter(_ > 0)
      assert(ranks.distinct.length == ranks.length, s"duplicate $c")
    }
  }

  test("q276: histogram matches an independent BigDecimal digit extraction") {
    val prices = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_extendedprice").collect().map(_.getDouble(0))
    val expected = prices
      .map(p => BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(100)).toBigInt.toString.head.asDigit)
      .groupBy(identity).map { case (d, xs) => (d, xs.length.toLong) }
    val got = SparkEntry.queries("q276_benford_audit")(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("digit"), r.getAs[Long]("n"))).toMap
    assert(got == expected)
    assert(got.keys.forall(d => d >= 1 && d <= 9))
    assert(got.values.sum == prices.length)
  }

  test("q276: expected Benford fractions sum to 1 and chi2 terms are non-negative") {
    val rows = SparkEntry.queries("q276_benford_audit")(spark, sf0001).collect()
    val expSum = rows.map(_.getAs[Double]("exp_frac")).sum
    assert(math.abs(expSum - 1.0) < 1e-4)
    val obsSum = rows.map(_.getAs[Double]("obs_frac")).sum
    assert(math.abs(obsSum - 1.0) < 1e-4)
    assert(rows.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }
}
