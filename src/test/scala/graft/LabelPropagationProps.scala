package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.LabelPropagation

/** Property checks for [[LabelPropagation]] on arbitrary small graphs:
  * labels are node ids from the SAME connected component (LPA can split
  * components, never merge across them), every endpoint is labeled
  * exactly once, and the result is invariant under edge-list order and
  * edge direction (it is a pure function of the edge SET).
  */
object LabelPropagationProps extends Properties("LabelPropagation") {

  // Each case runs several Spark jobs (3 sync rounds) — keep cases modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSession.spark

  private val edge: Gen[(Long, Long)] =
    for {
      a <- Gen.chooseNum(0L, 11L)
      b <- Gen.chooseNum(0L, 11L)
    } yield (a, b)

  private val edges: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(edge).map(_.take(25))

  private def run(es: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    LabelPropagation.run(es.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Components of the undirected graph, by union-find. */
  private def components(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("every endpoint labeled once, with a node id of its own component") =
    forAll(edges) { es =>
      val got = run(es)
      val comp = components(es)
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSet
      got.keySet == nodes && got.forall { case (id, label) =>
        nodes.contains(label) && comp(label) == comp(id)
      }
    }

  property("invariant under edge order and direction (pure function of the edge set)") =
    forAll(edges) { es =>
      val flipped = es.reverse.map { case (a, b) => (b, a) }
      run(es) == run(flipped)
    }
}
