package graft

import org.apache.spark.sql.functions._

/** Targeted checks for q275 (RRF hybrid retrieval) beyond the DuckDB
  * oracle: the fusion arithmetic is re-derived from the reported ranks.
  */
class RrfSpec extends SparkSuite {

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

}
