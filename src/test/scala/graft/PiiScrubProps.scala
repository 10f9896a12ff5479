package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.PiiScrub

/** PiiScrub contract properties: no email/phone/IPv4 survives a scrub,
  * scrubbing is idempotent (a second pass is a no-op — placeholders
  * must never re-match a pattern), and PII-free text passes through
  * byte-identical. */
object PiiScrubProps extends Properties("PiiScrub") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark = TestSession.spark

  private val word = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val email = for {
    u <- word; d <- word
    tld <- Gen.oneOf("com", "org", "co")
  } yield s"$u@$d.$tld"
  private val phone = for {
    cc <- Gen.choose(1, 999); a <- Gen.choose(100, 999); b <- Gen.choose(100, 9999)
  } yield s"+$cc $a-$b"
  private val ip = Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))
  private val piiDoc = for {
    pre <- Gen.listOfN(5, word); mid <- Gen.listOfN(3, word)
    p1 <- Gen.oneOf(email, phone, ip); p2 <- Gen.oneOf(email, phone, ip)
  } yield s"${pre.mkString(" ")} $p1 ${mid.mkString(" ")} $p2"

  private def scrubOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(PiiScrub.redact(col("t"))).collect()(0).getString(0)
  }

  private def javaFind(s: String, pat: String): Boolean =
    java.util.regex.Pattern.compile(pat).matcher(s).find()

  property("no PII survives; scrub is idempotent") = forAll(piiDoc) { doc =>
    val once = scrubOne(doc)
    !once.contains("@") &&
      !javaFind(once, PiiScrub.PhonePattern) &&
      !javaFind(once, PiiScrub.Ipv4Pattern) &&
      scrubOne(once) == once
  }

  property("PII-free text passes through unchanged") =
    forAll(Gen.listOfN(8, word)) { ws =>
      val clean = ws.mkString(" ")
      scrubOne(clean) == clean
    }
}
