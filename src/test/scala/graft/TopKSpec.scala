package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TopK

class TopKSpec extends SparkSuite {
  import spark.implicits._

  test("matches the row_number window on fixture data (total order)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val mine = TopK.perGroup(
        li,
        Seq(col("l_returnflag")),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        k = 5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      .collect()
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val window = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      .collect()
    assert(mine.length == window.length && mine.sameElements(window))
  }

  test("groups smaller than k emit all their rows; k=1 is argmax") {
    val df = Seq(("a", 1), ("a", 3), ("b", 7)).toDF("g", "v")
    val top2 = TopK.perGroup(df, Seq(col("g")), Seq(col("v").desc), 2)
      .orderBy("g", "v").as[(String, Int)].collect()
    assert(top2.toSeq == Seq(("a", 1), ("a", 3), ("b", 7)))
    val top1 = TopK.perGroup(df, Seq(col("g")), Seq(col("v").desc), 1)
      .orderBy("g").as[(String, Int)].collect()
    assert(top1.toSeq == Seq(("a", 3), ("b", 7)))
  }

  test("null order values and null group keys are ranked, not dropped") {
    val df = Seq(
      (Some("a"), Some(1)), (Some("a"), None), (None, Some(9)), (None, Some(2)))
      .toDF("g", "v")
    // NULLS LAST under desc: the null row only survives k=2 alongside 1
    val got = TopK.perGroup(df, Seq(col("g")), Seq(col("v").desc, col("g")), 2)
      .as[(Option[String], Option[Int])].collect().toSet
    assert(got == Set(
      (Some("a"), Some(1)), (Some("a"), None), (None, Some(9)), (None, Some(2))))
  }

  test("plans as partial heaps -> exchange -> survivor sort -> streaming final") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val df = TopK.perGroup(
      li, Seq(col("l_returnflag")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 3)
    df.collect() // materialize AQE final plan
    // the AQE print appends an "== Initial Plan ==" copy — assert on the
    // executed section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val iPartial = plan.indexOf("TopKPerGroup (partial)")
    val iFinal = plan.indexOf("TopKPerGroup (final)")
    val iSort = plan.indexOf("Sort [")
    assert(iPartial >= 0 && iFinal >= 0, plan)
    assert(plan.contains("hashpartitioning(l_returnflag"), plan)
    // The only sort is of partial SURVIVORS: above the exchange (between
    // final and partial in the top-down print), never below the partial —
    // full input partitions are never sorted.
    assert(iSort >= 0 && iFinal < iSort && iSort < iPartial,
      s"survivor sort must sit between final and partial:\n$plan")
    assert(!plan.substring(iPartial).contains("Sort ["),
      s"nothing below the partial stage may sort:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("near-unique group keys under a tiny partial cap: exact results via pass-through") {
    // groups ~= rows (the degenerate top-k ~= identity case that OOMed the
    // unbounded heap map): cap the partial stage at 8 retained rows so
    // nearly every row streams through to the sort-based final stage.
    spark.conf.set("spark.graft.topk.maxPartialRows", "8")
    try {
      val df = spark.range(0, 2000)
        .select(
          (col("id") % 1000).as("g"),
          col("id").as("v"))
      val got = TopK.perGroup(df, Seq(col("g")), Seq(col("v").desc), 1)
        .orderBy("g").as[(Long, Long)].collect().toSeq
      // two rows per group (id, id+1000): top-1 by v desc is id+1000
      assert(got == (0L until 1000L).map(g => (g, g + 1000L)))
    } finally spark.conf.unset("spark.graft.topk.maxPartialRows")
  }
}
