package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Survival

/** Property checks: [[Survival.kaplanMeier]] equals the quadratic
  * risk-set definition on arbitrary small censored samples, the curve is
  * non-increasing inside [0, 1], and a censoring-free sample reduces to
  * the empirical survival function. */
object SurvivalProps extends Properties("Survival") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSession.spark

  private val subject: Gen[(Long, Int)] =
    for {
      t <- Gen.chooseNum(0L, 8L) // few distinct times => heavy ties
      e <- Gen.oneOf(0, 1)
    } yield (t, e)

  private val subjects: Gen[List[(Long, Int)]] =
    Gen.nonEmptyListOf(subject).map(_.take(40))

  private def reference(subs: List[(Long, Int)]): List[(Long, Long, Long, Double)] = {
    val eventTimes = subs.filter(_._2 == 1).map(_._1).distinct.sorted
    var s = 1.0
    eventTimes.map { t =>
      val nRisk = subs.count(_._1 >= t).toLong
      val d = subs.count(x => x._1 == t && x._2 == 1).toLong
      s *= (1.0 - d.toDouble / nRisk)
      (t, nRisk, d, s)
    }
  }

  property("equals the quadratic risk-set definition, ties and censors included") =
    forAll(subjects) { subs =>
      import spark.implicits._
      val got = Survival.kaplanMeier(subs.toDF("t", "e"), "t", "e")
        .orderBy("t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
      val want = reference(subs)
      got.map(g => (g._1, g._2, g._3)) == want.map(w => (w._1, w._2, w._3)) &&
        got.zip(want).forall { case (g, w) => math.abs(g._4 - w._4) < 1e-9 }
    }

  property("survival is non-increasing and stays inside [0, 1]") =
    forAll(subjects) { subs =>
      import spark.implicits._
      val s = Survival.kaplanMeier(subs.toDF("t", "e"), "t", "e")
        .orderBy("t").collect().map(_.getDouble(3)).toList
      s.forall(x => x >= 0.0 && x <= 1.0 + 1e-12) &&
        s.zip(s.drop(1)).forall { case (a, b) => b <= a + 1e-12 }
    }

  // --- counting-process coxPH: interval data against a direct replica ---

  private val intervalCase: Gen[List[(Long, Long, Int, Double)]] =
    Gen.listOfN(50, for {
      start <- Gen.chooseNum(0L, 5L)
      len <- Gen.chooseNum(1L, 8L)
      e <- Gen.frequency(4 -> 1, 1 -> 0)
      x <- Gen.oneOf(0.0, 1.0)
    } yield (start, start + len, e, x))
      // the fit needs events on BOTH x levels or the MLE separates
      .suchThat(l => l.exists(s => s._3 == 1 && s._4 > 0) &&
        l.exists(s => s._3 == 1 && s._4 == 0))

  private def intervalReplica(data: List[(Long, Long, Int, Double)]): Double = {
    val times = data.filter(_._3 == 1).map(_._2).distinct.sorted
    def ui(b: Double): (Double, Double) = {
      var u = 0.0; var fi = 0.0
      times.foreach { t =>
        val ev = data.filter(s => s._2 == t && s._3 == 1)
        val rs = data.filter(s => s._1 < t && t <= s._2)
        val d = ev.length
        val s0 = rs.map(s => math.exp(b * s._4)).sum
        val s1 = rs.map(s => s._4 * math.exp(b * s._4)).sum
        val s2 = rs.map(s => s._4 * s._4 * math.exp(b * s._4)).sum
        u += ev.map(_._4).sum - d * s1 / s0
        fi += d * (s2 / s0 - (s1 / s0) * (s1 / s0))
      }
      (u, fi)
    }
    var b = 0.0
    (1 to 8).foreach { _ => val (u, fi) = ui(b); b += u / fi }
    b
  }

  property("counting-process fit equals the interval-risk-set replica on any intervals") =
    forAll(intervalCase) { data =>
      import spark.implicits._
      val want = intervalReplica(data)
      if (!java.lang.Double.isFinite(want) || math.abs(want) > 4.0) true // separated draw
      else {
        val got = Survival.coxPH(data.toDF("t0", "t", "e", "x"), Seq("x"), "t", "e",
          ties = "breslow", startCol = Some("t0"))
          .select("beta").head.getDouble(0)
        math.abs(got - want) < 1e-9
      }
    }

  property("cluster-robust SE is exactly invariant to within-cluster duplication") =
    forAll(for {
      data <- intervalCase
      k <- Gen.oneOf(2, 3)
    } yield (data, k)) { case (data, k) =>
      import spark.implicits._
      if (!java.lang.Double.isFinite(intervalReplica(data)) ||
        math.abs(intervalReplica(data)) > 4.0) true
      else {
        val ids = data.zipWithIndex.map { case ((t0, t, e, x), i) =>
          (i.toLong % 17, t0, t, e, x) // several rows share a cluster
        }
        val one = Survival.coxPH(ids.toDF("id", "t0", "t", "e", "x"),
          Seq("x"), "t", "e", ties = "breslow", startCol = Some("t0"),
          clusterCol = Some("id")).head
        val dup = ids.flatMap(r => List.fill(k)(r))
        val many = Survival.coxPH(dup.toDF("id", "t0", "t", "e", "x"),
          Seq("x"), "t", "e", ties = "breslow", startCol = Some("t0"),
          clusterCol = Some("id")).head
        math.abs(one.getAs[Double]("beta") - many.getAs[Double]("beta")) < 1e-9 &&
          math.abs(one.getAs[Double]("robust_se") - many.getAs[Double]("robust_se")) < 1e-9
      }
    }
}
