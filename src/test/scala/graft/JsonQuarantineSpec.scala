package graft

import org.apache.spark.sql.types._

import graft.io.JsonQuarantine

/** [[JsonQuarantine.read]] — routing contract on a hand-built JSONL:
  * valid lines pass typed, type-corrupt fields quarantine with raw text
  * intact, malformed lines quarantine with the malformed flag, ABSENT
  * fields are missing data (not corruption), unknown fields are
  * ignored. */
class JsonQuarantineSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("n", LongType),
    StructField("tag", StringType)))

  test("routes valid / type-corrupt / malformed / short / extra-field lines correctly") {
    val dir = java.nio.file.Files.createTempDirectory("jsonq").toString + "/feed"
    Seq(
      """{"id":1,"n":10,"tag":"a"}""", // valid
      """{"id":2,"n":"xx","tag":"b"}""", // type corrupt: n unparseable
      """{"id":3,"n":30,"tag":"c""", // malformed: unterminated
      """{"id":4,"tag":"d"}""", // short: n absent -> null, NOT corrupt
      """{"id":5,"n":50,"tag":"e","extra":true}""" // unknown field ignored
    ).toDF("value").coalesce(1).write.text(dir)

    val routed = JsonQuarantine.read(spark, dir, schema)
    val good = routed.good.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(good.toSeq == Seq((1L, 10L, "a"), (4L, -1L, "d"), (5L, 50L, "e")))

    val bad = routed.bad.collect()
      .map(r => (r.getString(0), r.getBoolean(1))).sortBy(_._1)
    assert(bad.length == 2)
    assert(bad.exists { case (raw, mal) => raw.contains("\"xx\"") && !mal },
      "type corruption is quarantined but not malformed")
    assert(bad.exists { case (raw, mal) => raw.startsWith("""{"id":3""") && mal },
      "unterminated line is malformed")
    // the type-corrupt row keeps its parseable raw fields for the audit
    val corrupt = routed.bad.filter(!$"is_malformed").collect()(0)
    assert(corrupt.getAs[String]("raw_id") == "2" &&
      corrupt.getAs[String]("raw_n") == "xx")
  }

  test("a declared _corrupt field refuses (reserved for the injected column)") {
    val e = intercept[IllegalArgumentException](JsonQuarantine.read(
      spark, "/tmp/nowhere",
      StructType(Seq(StructField("_corrupt", StringType), StructField("x", LongType)))))
    assert(e.getMessage.contains("_corrupt"))
  }

  test("field names containing dots resolve as struct fields, not nested paths") {
    val dir = java.nio.file.Files.createTempDirectory("jsonq_dot").toString + "/feed"
    Seq(
      """{"a.b":1,"v":10}""", // valid
      """{"a.b":2,"v":"zz"}""" // v type-corrupt
    ).toDF("value").coalesce(1).write.text(dir)
    val dotted = StructType(Seq(StructField("a.b", LongType), StructField("v", LongType)))
    val routed = JsonQuarantine.read(spark, dir, dotted)
    val good = routed.good.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(good.toSeq == Seq((1L, 10L)), "dotted field must not mis-detect corruption")
    val bad = routed.bad.collect()
    assert(bad.length == 1 && bad(0).getAs[String]("raw_a.b") == "2" &&
      bad(0).getAs[String]("raw_v") == "zz")
  }
}
