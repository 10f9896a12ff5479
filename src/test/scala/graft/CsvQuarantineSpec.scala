package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.CsvQuarantine

/** [[CsvQuarantine]] — exact routing (no row lost, none double-counted),
  * typed good output, raw fields kept on the bad side, and the
  * short-row/string-schema conventions. */
class CsvQuarantineSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("price", DoubleType),
    StructField("name", StringType)))

  private def writeCsv(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("csvq")
    java.nio.file.Files.writeString(dir.resolve("part.csv"),
      ("id,price,name" +: lines).mkString("\n"))
    dir.toString
  }

  test("exact routing: every row lands on exactly one side") {
    val dir = writeCsv(Seq(
      "1,9.5,alpha",
      "2,notaprice,beta", // corrupt price
      "xx,3.5,gamma",     // corrupt id
      "4,,delta",         // empty numeric -> null, NOT corrupt
      "5,7.25,"))         // empty string field fine
    val r = CsvQuarantine.read(spark, dir, schema)
    assert(r.good.count() + r.bad.count() == 5)
    assert(r.good.select("id").as[Option[Long]].collect().flatten.sorted.toSeq ==
      Seq(1L, 4L, 5L))
    assert(r.good.schema == schema, "good carries the declared types")
    val bad = r.bad.orderBy("raw_line").collect()
    assert(bad.length == 2)
    assert(bad.map(_.getAs[String]("raw_line")).toSeq.sorted ==
      Seq("2,notaprice,beta", "xx,3.5,gamma"))
    // raw fields survive on the bad side for triage
    assert(bad.map(_.getAs[String]("id")).toSeq.sorted == Seq("2", "xx"))
  }

  test("short rows null-fill without being quarantined; all-string schema never corrupts") {
    val dir = writeCsv(Seq("1,2.0,a", "2"))
    val r = CsvQuarantine.read(spark, dir, schema)
    assert(r.bad.count() == 0)
    assert(r.good.count() == 2)
    val strings = StructType(schema.fields.map(_.copy(dataType = StringType)))
    val r2 = CsvQuarantine.read(spark, writeCsv(Seq("anything,goes,here")), strings)
    assert(r2.bad.count() == 0 && r2.good.count() == 1)
  }

  test("routing survives aggregation pushdown (the PERMISSIVE trap this op avoids)") {
    // counting the bad side alone must NOT collapse to zero
    val dir = writeCsv((1 to 100).map(i =>
      if (i % 10 == 0) s"bad$i,1.0,x" else s"$i,1.0,x"))
    val r = CsvQuarantine.read(spark, dir, schema)
    assert(r.bad.agg(count(lit(1))).collect()(0).getLong(0) == 10)
    assert(r.good.agg(count(lit(1))).collect()(0).getLong(0) == 90)
  }
}
