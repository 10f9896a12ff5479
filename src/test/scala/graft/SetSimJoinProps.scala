package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.SetSimJoin

/** Property check for [[SetSimJoin.selfJoin]]: on arbitrary small
  * corpora over a tiny element alphabet (maximal collision pressure on
  * the prefix + positional filters), the result EQUALS the brute-force
  * all-pairs Jaccard join — same pairs, same intersection counts. This
  * pins the exactness argument for the PPJoin positional filter (no
  * false negatives) independently of the DuckDB oracle fixtures.
  */
object SetSimJoinProps extends Properties("SetSimJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark

  // Small alphabet => many shared elements => dense candidate pressure.
  private val docSet: Gen[Set[String]] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"))
        .map(_.toSet))

  private val corpus: Gen[List[Set[String]]] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, docSet))

  private val threshold: Gen[Double] = Gen.oneOf(0.3, 0.5, 0.6, 0.8)

  private def brute(docs: List[Set[String]], t: Double): Set[(Long, Long, Long)] =
    (for {
      i <- docs.indices; j <- docs.indices if i < j
      inter = (docs(i) & docs(j)).size
      union = (docs(i) | docs(j)).size
      if union > 0 && inter.toDouble / union >= t
    } yield (i.toLong, j.toLong, inter.toLong)).toSet

  property("equals the brute-force all-pairs Jaccard join") =
    forAll(corpus, threshold) { (docs, t) =>
      import spark.implicits._
      val tok = docs.zipWithIndex
        .flatMap { case (s, i) => s.map(w => (i.toLong, w)) }
        .toDF("id", "w")
      val got = SetSimJoin.selfJoin(tok, t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      got == brute(docs, t)
    }
}
