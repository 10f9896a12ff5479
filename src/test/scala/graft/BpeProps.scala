package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Bpe

/** Property check: decode∘segmentWords is the whitespace-normalizing
  * identity for ARBITRARY strings over the training alphabet — including
  * words the training corpus never saw (OOV words must still round-trip
  * through character symbols), empty-ish inputs, and heavy repetition
  * that exercises greedy merge chains like ["aa","a"]. */
object BpeProps extends Properties("Bpe") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark

  // rules trained ONCE on a fixed small corpus over {a,b,c}
  private lazy val rules = {
    import spark.implicits._
    Bpe.train(
      Seq("abab abab cab", "aaa aab abc abc", "cc ccc abab").toDF("text"),
      "text", numMerges = 6, minPairFreq = 2L)
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)

  private val text: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("decode(segmentWords(s)) == whitespace-normalized s, OOV included") =
    forAll(Gen.listOfN(5, text)) { texts =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val rt = Bpe.segmentWords(df, "text", rules)
        .select(col("id"), Bpe.decode(col("bpe_words")).as("decoded"), col("text"))
        .collect()
      rt.forall { r =>
        val norm = r.getString(2).trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
        r.getString(1) == norm
      }
    }
}
