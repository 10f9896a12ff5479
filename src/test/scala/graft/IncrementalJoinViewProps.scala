package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.io.VersionedTable
import graft.ops.IncrementalJoinView
import graft.ops.IncrementalJoinView.Spec

/** Property check for [[IncrementalJoinView]]: under ARBITRARY small
  * sequences of fact appends/deletes, dim segment migrations, LATE dim
  * arrivals (fact rows whose fk dangles until the dim row shows up —
  * exercised only by the F_old⋈ΔD term), and refreshes at random points,
  * the view equals a from-scratch join-aggregate of the final state.
  */
object IncrementalJoinViewProps extends Properties("IncrementalJoinView") {

  // every case runs several table commits + refreshes — keep cases few
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSession.spark

  sealed trait Op
  final case class AppendFact(k: Long, dk: Long, v: Double) extends Op
  final case class DeleteFact(pick: Int) extends Op
  final case class MigrateDim(pick: Int, seg: String) extends Op
  final case class AddDim(dk: Long, seg: String) extends Op
  case object Refresh extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> (for {
      k <- Gen.chooseNum(100L, 999L); dk <- Gen.oneOf(10L, 20L, 30L, 99L)
      v <- Gen.chooseNum(1, 50)
    } yield AppendFact(k, dk, v.toDouble)),
    2 -> Gen.chooseNum(0, 10).map(DeleteFact(_)),
    2 -> (for {
      p <- Gen.chooseNum(0, 5); s <- Gen.oneOf("red", "blue", "green")
    } yield MigrateDim(p, s)),
    1 -> Gen.oneOf("red", "blue").map(AddDim(99L, _)),
    2 -> Gen.const(Refresh))

  private val genOps: Gen[List[Op]] = Gen.listOfN(5, genOp)

  property("view == from-scratch recompute after any op sequence") =
    forAll(genOps) { ops =>
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("ijvp").toFile
      root.deleteOnExit()
      val (factP, dimP, viewP) = (root + "/f", root + "/d", root + "/v")

      var fact = Map(1L -> (10L, 5.0), 2L -> (20L, 7.0), 3L -> (10L, 11.0))
      var dim = Map(10L -> "red", 20L -> "blue", 30L -> "green")
      VersionedTable.commitAppend(
        fact.toSeq.map { case (k, (dk, v)) => (k, dk, v) }.toDF("k", "dk", "v"), factP)
      VersionedTable.commitAppend(dim.toSeq.toDF("d_id", "seg"), dimP)
      val sp = Spec(factP, dimP, "dk", "d_id", Seq("seg"), Seq("v"))
      IncrementalJoinView.refresh(spark, sp, viewP, "p") // bootstrap

      // distinct keys per append within one run (duplicate fact keys would
      // break merge semantics, which is out of scope here)
      var nextK = 1000L
      ops.foreach {
        case AppendFact(_, dk, v) =>
          val k = nextK; nextK += 1
          VersionedTable.commitAppend(Seq((k, dk, v)).toDF("k", "dk", "v"), factP)
          fact += k -> (dk, v)
        case DeleteFact(pick) if fact.nonEmpty =>
          val k = fact.keys.toSeq.sorted.apply(pick % fact.size)
          VersionedTable.deleteWhere(spark, factP, col("k") === k)
          fact -= k
        case DeleteFact(_) => ()
        case MigrateDim(pick, seg) =>
          val dk = dim.keys.toSeq.sorted.apply(pick % dim.size)
          VersionedTable.merge(spark, dimP, Seq((dk, seg)).toDF("d_id", "seg"), Seq("d_id"))
          dim += dk -> seg
        case AddDim(dk, seg) if !dim.contains(dk) =>
          VersionedTable.commitAppend(Seq((dk, seg)).toDF("d_id", "seg"), dimP)
          dim += dk -> seg
        case AddDim(_, _) => ()
        case Refresh =>
          IncrementalJoinView.refresh(spark, sp, viewP, "p")
      }
      IncrementalJoinView.refresh(spark, sp, viewP, "p")

      val expected = fact.toSeq
        .flatMap { case (_, (dk, v)) => dim.get(dk).map(seg => seg -> v) }
        .groupBy(_._1)
        .map { case (seg, vs) => seg -> (vs.size.toLong, vs.map(_._2).sum) }
      val got = VersionedTable.read(spark, viewP)
        .collect()
        .map(r => r.getAs[String]("seg") ->
          (r.getAs[Long]("cnt"), r.getAs[Double]("sum_v")))
        .toMap
      got == expected
    }
}
