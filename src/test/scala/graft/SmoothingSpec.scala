package graft

import graft.ops.Smoothing

/** Truncated EWMA ([[Smoothing.ewmaTruncated]]): lag-tap formulation vs an
  * independent in-memory kernel sum, warm-up renormalization, null taps,
  * and key isolation. */
class SmoothingSpec extends SparkSuite {
  import spark.implicits._

  private val alpha = 0.3
  private val k = 4

  /** Independent reference: explicit kernel over the available history. */
  private def reference(xs: Seq[Option[Double]]): Seq[Option[Double]] = {
    val w = Smoothing.weights(alpha, k)
    xs.indices.map { i =>
      val taps = (0 until k).flatMap { j =>
        if (i - j >= 0) xs(i - j).map(v => (w(j) * v, w(j))) else None
      }
      if (taps.isEmpty || taps.map(_._2).sum <= 0) None
      else Some(taps.map(_._1).sum / taps.map(_._2).sum)
    }
  }

  private def run(series: Map[Long, Seq[Option[Double]]]): Map[(Long, Int), Option[Double]] = {
    val rows = series.toSeq.flatMap { case (key, xs) =>
      xs.zipWithIndex.map { case (x, i) => (key, i, x) }
    }
    Smoothing.ewmaTruncated(
      rows.toDF("k", "i", "x"), Seq("k"), Seq("i"), "x", alpha, k)
      .select("k", "i", "ewma").as[(Long, Int, Option[Double])]
      .collect().map { case (key, i, e) => (key, i) -> e }.toMap
  }

  test("matches the explicit kernel on a plain series, including warm-up") {
    val xs = Seq(10.0, 20.0, 5.0, 40.0, 15.0, 30.0).map(Some(_))
    val got = run(Map(1L -> xs))
    val want = reference(xs)
    xs.indices.foreach { i =>
      assert(math.abs(got((1L, i)).get - want(i).get) < 1e-12, s"i=$i")
    }
    // first row is just x_0 after renormalization
    assert(math.abs(got((1L, 0)).get - 10.0) < 1e-12)
  }

  test("null values contribute nothing and do not null the window") {
    val xs = Seq(Some(10.0), None, Some(30.0))
    val got = run(Map(1L -> xs))
    val want = reference(xs)
    assert(got((1L, 1)) == want(1) && want(1).isDefined) // renormalized over x_0 only
    xs.indices.foreach(i => assert(
      math.abs(got((1L, i)).get - want(i).get) < 1e-12))
  }

  test("keys are isolated: one key's history never leaks into another") {
    val got = run(Map(1L -> Seq(Some(100.0), Some(100.0)), 2L -> Seq(Some(1.0))))
    assert(math.abs(got((2L, 0)).get - 1.0) < 1e-12)
  }

  test("converges to the untruncated recursion once warm (tail mass < (1-a)^k)") {
    // constant series: every renormalized kernel average is exactly the constant
    val got = run(Map(1L -> Seq.fill(10)(Some(7.5))))
    (0 until 10).foreach(i => assert(math.abs(got((1L, i)).get - 7.5) < 1e-12))
  }
}
