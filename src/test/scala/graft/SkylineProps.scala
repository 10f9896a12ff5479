package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Skyline

/** Property check: [[Skyline.maxMax2D]] equals the quadratic dominance
  * definition on arbitrary small point sets — heavy ties on either or
  * both coordinates included (the construction's edge cases: same-x
  * groups, duplicate points, single-point frontiers).
  */
object SkylineProps extends Properties("Skyline") {

  // Spark jobs per case — keep the case count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSession.spark

  private val point: Gen[(Long, Double)] =
    for {
      x <- Gen.chooseNum(0L, 6L) // few distinct x values => many ties
      y <- Gen.oneOf(Gen.chooseNum(0, 8).map(_.toDouble), Gen.const(4.0))
    } yield (x, y)

  private val points: Gen[List[(Long, Double)]] =
    Gen.nonEmptyListOf(point).map(_.take(40))

  property("equals the quadratic dominance test, ties included") =
    forAll(points) { pts =>
      import spark.implicits._
      val df = pts.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val got = Skyline.maxMax2D(df, "x", "y")
        .select("id").as[Long].collect().toSet
      val indexed = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val want = indexed.filter { case (_, xa, ya) =>
        !indexed.exists { case (_, xb, yb) =>
          xb >= xa && yb >= ya && (xb > xa || yb > ya)
        }
      }.map(_._1).toSet
      got == want
    }
}
