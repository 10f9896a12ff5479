package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.io.VersionedTable

/** Property: the bucketed layout is INVISIBLE to results — for any data
  * and any bucket count, a co-bucketed join returns exactly what the
  * plain join over the same rows returns, and appends never lose or
  * duplicate rows across the bucket boundary. The plan-shape wins are
  * asserted in BucketedJoinSpec; this harness guards the part that
  * must never depend on them. */
object BucketedJoinProps extends Properties("BucketedJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSession.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("vt_bkprop").toString + "/t"

  private val genCase = for {
    n <- Gen.choose(2, 7)
    keysA <- Gen.listOfN(60, Gen.choose(-50L, 50L))
    keysB <- Gen.listOfN(40, Gen.choose(-50L, 50L))
    split <- Gen.choose(1, 59)
  } yield (n, keysA, keysB, split)

  property("co-bucketed join == plain join; appends lose/duplicate nothing") =
    forAll(genCase) { case (n, keysA, keysB, split) =>
      import spark.implicits._
      val a = fresh(); val b = fresh()
      val dfA = keysA.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("id", "pa")
      val dfB = keysB.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("id", "pb")
      // A lands in two bucketed appends (exercises multi-file buckets)
      val (a1, a2) = keysA.zipWithIndex.splitAt(split)
      VersionedTable.commitBucketed(
        a1.map { case (k, i) => (k, i.toLong) }.toDF("id", "pa"), a, "id", n)
      VersionedTable.commitBucketed(
        a2.map { case (k, i) => (k, i.toLong) }.toDF("id", "pa"), a, "id", n)
      VersionedTable.commitBucketed(dfB, b, "id", n)
      val got = VersionedTable.table(spark, a)
        .join(VersionedTable.table(spark, b), "id")
        .select("id", "pa", "pb")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val want = dfA.join(dfB, "id").select("id", "pa", "pb")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      got == want &&
        VersionedTable.table(spark, a).count() == keysA.size.toLong
    }
}
