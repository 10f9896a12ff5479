package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.tools.ColumnLineage

/** Contract of [[ColumnLineage]]: every defining node kind our queries
  * use (project, aggregate, join, window, generate/explode, union,
  * rollup/Expand) resolves output columns to the right LEAF
  * table.column sets, on the real fixture tables.
  */
class ColumnLineageSpec extends SparkSuite {

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
  private def or = spark.read.parquet(s"$sf0001/orders.parquet")

  test("projection + computed column + filter") {
    val df = li
      .filter(col("l_quantity") > 10)
      .select(
        col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    val got = ColumnLineage.of(df)
    assert(got("l_orderkey") == Set("lineitem.l_orderkey"))
    assert(got("revenue") == Set("lineitem.l_extendedprice", "lineitem.l_discount"))
  }

  test("join + aggregate traces across both inputs") {
    val df = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("cnt"))
    val got = ColumnLineage.of(df)
    assert(got("o_orderpriority") == Set("orders.o_orderpriority"))
    assert(got("revenue") == Set("lineitem.l_extendedprice", "lineitem.l_discount"))
    assert(got("cnt") == Set.empty)
  }

  test("window expression depends on partition, order, and value columns") {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    val df = li.select(
      col("l_orderkey"),
      lag(col("l_extendedprice"), 1).over(w).as("prev_price"))
    val got = ColumnLineage.of(df)
    assert(got("prev_price") == Set(
      "lineitem.l_extendedprice", "lineitem.l_orderkey", "lineitem.l_linenumber"))
  }

  test("explode and union merge leaf sets") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val exploded = docs.select(
      col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val gotE = ColumnLineage.of(exploded)
    assert(gotE("w") == Set("documents.text"))

    val u = li.select(col("l_orderkey").as("k"), col("l_extendedprice").as("v"))
      .union(or.select(col("o_orderkey").as("k"), col("o_totalprice").as("v")))
    val gotU = ColumnLineage.of(u)
    assert(gotU("k") == Set("lineitem.l_orderkey", "orders.o_orderkey"))
    assert(gotU("v") == Set("lineitem.l_extendedprice", "orders.o_totalprice"))
  }

  test("rollup (Expand) keeps grouping-column lineage") {
    val df = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("qty"))
    val got = ColumnLineage.of(df)
    assert(got("l_returnflag") == Set("lineitem.l_returnflag"))
    assert(got("qty") == Set("lineitem.l_quantity"))
  }

  test("report emits sorted dependency edges") {
    val df = li.select(
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    val rows = ColumnLineage.report(df).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      "revenue" -> "lineitem.l_discount",
      "revenue" -> "lineitem.l_extendedprice"))
  }

  test("a registry flagship resolves end-to-end (q16 star join)") {
    val df = SparkEntry.queries("q16_join_revenue")(spark, sf0001)
    val got = ColumnLineage.of(df)
    assert(got.keySet.nonEmpty)
    // the revenue-ish measure must reach lineitem's price columns
    val revenueCols = got.filter(_._2.exists(_.startsWith("lineitem.l_extendedprice")))
    assert(revenueCols.nonEmpty, s"no output traces to lineitem.l_extendedprice: $got")
  }
}
