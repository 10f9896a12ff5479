package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters

/** Misra-Gries guarantees exercised where the registry fixture can't: the
  * documents vocab (31 words) fits inside k, so q112 never evicts. Here a
  * seeded Zipf corpus forces evictions in both the reduce and merge paths
  * and the PODS'12 bounds are asserted directly.
  */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  // Zipf-ish corpus: rank r in 1..200 occurs ceil(2000/r) times.
  private lazy val zipf: Seq[String] =
    (1 to 200).flatMap(r => Seq.fill(math.ceil(2000.0 / r).toInt)(f"w$r%03d"))
  private lazy val n = zipf.size.toLong

  test("every key above the n/(k+1) survival bound is nominated, despite evictions") {
    val k = 20
    // Deterministic shuffle of row order (seeded) + many partitions: both
    // the per-partition decrement path and the cross-partition merge path
    // run. 200 distinct >> k=20 guarantees evictions happen.
    val rows = new scala.util.Random(7).shuffle(zipf).toDF("w").repartition(13)
    val cand = HeavyHitters.candidates(rows, col("w"), k)
      .as[String].collect().toSet
    assert(cand.size <= k, s"MG summary exceeded k: ${cand.size}")
    val bound = n.toDouble / (k + 1)
    val mustSurvive = (1 to 200).filter(r => math.ceil(2000.0 / r) > bound)
      .map(r => f"w$r%03d")
    assert(mustSurvive.nonEmpty, "fixture no longer forces guaranteed survivors")
    mustSurvive.foreach(w => assert(cand.contains(w), s"guaranteed heavy hitter $w evicted"))
  }

  test("topExact returns exact counts for the true top-n, deterministically") {
    val k = 20
    val rows = new scala.util.Random(11).shuffle(zipf).toDF("w").repartition(13)
    val got = HeavyHitters.topExact(rows, col("w"), k, n = 3)
      .as[(String, Long)].collect().toSeq
    val expected = zipf.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(3)
    assert(got == expected, s"got $got, expected $expected")
    // Re-run under a different layout: exact verify makes it reproducible.
    val again = HeavyHitters.topExact(rows.repartition(3), col("w"), k, n = 3)
      .as[(String, Long)].collect().toSeq
    assert(again == expected)
  }

  test("MG estimates under-count by at most n/(k+1)") {
    val k = 20
    val agg = new HeavyHitters.MisraGriesAgg(k)
    val summary = new scala.util.Random(13).shuffle(zipf)
      .grouped(1000).map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    val exact = zipf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    summary.foreach { case (w, est) =>
      val truth = exact(w)
      assert(est <= truth, s"$w over-counted: est=$est true=$truth")
      assert(truth - est <= bound, s"$w under-counted past bound: est=$est true=$truth")
    }
  }
}
