package graft

import org.apache.spark.sql.functions._

import graft.ops.Scd2

/** SCD2 history construction ([[Scd2.buildHistory]]): hand-computed
  * version intervals, no-op-change collapse, null-attribute handling, and
  * interval integrity properties. */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  test("hand-computed: repeated values collapse, intervals chain, last is current") {
    val ch = Seq(
      (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "A"),
      (2L, 15L, "X")
    ).toDF("k", "t", "status")
    val got = Scd2.buildHistory(ch, Seq("k"), Seq("t"), Seq("status"))
      .select("k", "t", "status", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == Seq(
      (1L, 10L, "A", 10L, Some(30L), false), // t=20 A collapsed away
      (1L, 30L, "B", 30L, Some(40L), false),
      (1L, 40L, "A", 40L, None, true), // A again RE-opens (value changed back)
      (2L, 15L, "X", 15L, None, true)))
  }

  test("null attributes compare null-safely (null→null is a no-op change)") {
    val ch = Seq(
      (1L, 1L, Option.empty[String]), (1L, 2L, Option.empty[String]),
      (1L, 3L, Some("v")), (1L, 4L, Option.empty[String])
    ).toDF("k", "t", "a")
    val got = Scd2.buildHistory(ch, Seq("k"), Seq("t"), Seq("a"))
      .select("t").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L, 4L)) // t=2 collapsed; null→v and v→null both open
  }

  test("interval integrity on the fixture: chained, non-overlapping, one current per key") {
    val ch = graft.core.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_orderstatus"))
    val hist = Scd2.buildHistory(
      ch, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"), Seq("o_orderstatus"))
    // exactly one open interval per key
    val open = hist.filter(col("is_current")).groupBy("o_custkey").count()
    assert(open.filter(col("count") =!= 1).count() == 0)
    // valid_from < valid_to for every closed interval
    assert(hist.filter(col("valid_to").isNotNull && col("valid_from") > col("valid_to"))
      .count() == 0)
    // consecutive versions never carry the same status (collapse worked)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    val sameAsPrev = hist
      .withColumn("prev", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") === col("o_orderstatus"))
    assert(sameAsPrev.count() == 0)
  }
}
