package graft

/** q303 (sketch-merged sliding WAU) against q255 (exact band-join WAU):
  * same day grid, estimates inside the lgK=12 HLL error envelope, and
  * the estimate is deterministic across layouts (DataSketches HLL union
  * is order-insensitive on its register maxima). */
class HllWauSpec extends SparkSuite {

  test("sketch WAU tracks exact WAU within the lgK=12 envelope on the fixture") {
    val exact = SparkEntry.queries("q255_wau_stickiness")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val est = SparkEntry.queries("q303_wau_hll")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet, "same day grid")
    // lgK=12 -> typical relative standard error ~1.6%; allow 4 sigma
    exact.foreach { case (day, n) =>
      val e = est(day)
      assert(math.abs(e - n) / n <= 0.065, s"$day exact=$n est=$e")
    }
  }

  test("estimate is layout-deterministic (union is register-max, order-free)") {
    val a = SparkEntry.queries("q303_wau_hll")(spark, sf0001).collect().toSeq
    val b = SparkEntry.queries("q303_wau_hll")(spark, sf0001).collect().toSeq
    assert(a == b)
  }
}
