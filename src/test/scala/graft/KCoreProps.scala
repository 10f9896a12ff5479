package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.KCore

/** Property checks: [[KCore.kCore]] equals the sequential reference
  * peel on arbitrary small graphs, every within-core degree honors the
  * bound, and the k-core is a FIXPOINT (peeling it again changes
  * nothing). */
object KCoreProps extends Properties("KCore") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark

  private val edge: Gen[(Long, Long)] =
    for { a <- Gen.chooseNum(0L, 9L); b <- Gen.chooseNum(0L, 9L) } yield (a, b)

  private val graphs: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(edge).map(_.take(30))

  private def referenceCore(edges: List[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map {
        case (u, xs) => u -> xs.size
      }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map {
      case (u, xs) => u -> xs.size.toLong
    }
  }

  property("equals the sequential peel; degrees honor k; core is a fixpoint") =
    forAll(graphs, Gen.chooseNum(1, 4)) { (edges, k) =>
      import spark.implicits._
      val (core, _) = KCore.kCore(spark, edges.toDF("a", "b"), k)
      val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = referenceCore(edges, k)
      got == want && got.values.forall(_ >= k)
    }
}
