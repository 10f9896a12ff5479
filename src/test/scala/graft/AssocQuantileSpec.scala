package graft

import org.apache.spark.sql.functions._

/** Targeted checks for q277 (association rules) and q278 (per-source
  * quantile normalization): the rule metrics are recomputed from scratch
  * in driver-side Scala over the raw (order, part) pairs, and the decile
  * assignment is pinned to its order/extreme invariants per source.
  */
class AssocQuantileSpec extends SparkSuite {

  test("q277: top-20 lift list matches a from-scratch Scala recomputation") {
    val op = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = op.map(_._1).distinct.length
    val partCount = op.groupBy(_._2).map { case (p, xs) => (p, xs.length) }
    val pairCount = op.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (pr, xs) => (pr, xs.size) }
      .filter(_._2 >= 2)
    def r6d(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = pairCount.toSeq.map { case ((p1, p2), nAb) =>
      val lift = r6d(nAb.toDouble * nOrders / (partCount(p1).toDouble * partCount(p2)))
      (p1, p2, nAb.toLong, lift)
    }.sortBy { case (p1, p2, _, lift) => (-lift, p1, p2) }.take(20)
    val got = SparkEntry.queries("q277_market_basket")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
        r.getAs[Long]("n_ab"), r.getAs[Double]("lift"))).toSeq
    assert(got == expected)
  }

  test("q277: support and confidence agree with the reported counts") {
    val op = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
    val nOrders = op.select("l_orderkey").distinct().count()
    val pc = op.collect().groupBy(_.getLong(1)).map { case (p, xs) => (p, xs.length) }
    SparkEntry.queries("q277_market_basket")(spark, sf0001).collect().foreach { r =>
      val nAb = r.getAs[Long]("n_ab")
      assert(nAb >= 2)
      assert(math.abs(r.getAs[Double]("support") - nAb.toDouble / nOrders) < 1e-6)
      assert(math.abs(
        r.getAs[Double]("confidence") - nAb.toDouble / pc(r.getAs[Long]("p1"))) < 1e-6)
    }
  }

  test("q278: deciles are monotone in n_chars within each source, extremes at 0/9") {
    val rows = SparkEntry.queries("q278_quantile_normalize")(spark, sf0001)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Int]("decile")))
    assert(rows.length == 500)
    rows.groupBy(_._1).foreach { case (src, xs) =>
      val sorted = xs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, c1, d1), (_, c2, d2)) =>
          assert(d1 <= d2 || c1 == c2, s"$src: decile not monotone in n_chars")
        case _ =>
      }
      assert(sorted.head._3 == 0, s"$src: min length not decile 0")
      assert(sorted.last._3 == 9, s"$src: max length not decile 9")
      assert(xs.forall(x => x._3 >= 0 && x._3 <= 9))
    }
  }
}
