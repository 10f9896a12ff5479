package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.DeflateRatio

/** Contract of [[DeflateRatio]]: repetitive text compresses well below
  * varied prose, empty text scores 1.0, and interpreted eval, codegen,
  * and the registered SQL function all agree.
  */
class DeflateRatioSpec extends SparkSuite {

  private val spam = Seq.fill(50)("buy now").mkString(" ")
  private val prose =
    "the quick brown fox jumps over a lazy dog while seventeen jugglers " +
      "balance quartz vases on mismatched unicycles near the harbor wall"

  test("repetitive text scores far below varied prose; empty text is 1.0") {
    val rSpam = DeflateRatio.ratioOf(UTF8String.fromString(spam))
    val rProse = DeflateRatio.ratioOf(UTF8String.fromString(prose))
    assert(rSpam < 0.2, s"spam ratio $rSpam")
    assert(rProse > 0.5, s"prose ratio $rProse")
    assert(DeflateRatio.ratioOf(UTF8String.fromString("")) == 1.0)
  }

  test("expression output equals the direct helper (codegen path)") {
    import spark.implicits._
    val df = Seq((1L, spam), (2L, prose), (3L, "")).toDF("id", "text")
      .withColumn("r", DeflateRatio(col("text")))
      .select("id", "r")
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == DeflateRatio.ratioOf(UTF8String.fromString(spam)))
    assert(got(2L) == DeflateRatio.ratioOf(UTF8String.fromString(prose)))
    assert(got(3L) == 1.0)
    // null in, null out
    val withNull = Seq((1L, Option.empty[String])).toDF("id", "text")
      .withColumn("r", DeflateRatio(col("text")))
      .select("r")
    assert(withNull.collect().head.isNullAt(0))
  }

  test("registered SQL function agrees") {
    val viaSql = spark.sql(s"SELECT deflate_ratio('${prose}') AS r")
      .collect().head.getDouble(0)
    assert(viaSql == DeflateRatio.ratioOf(UTF8String.fromString(prose)))
  }
}
