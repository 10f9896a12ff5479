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

  test("plans as partial+final heaps around one group-key exchange, no sort") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val df = TopK.perGroup(
      li, Seq(col("l_returnflag")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 3)
    df.collect() // materialize AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup (partial)"), plan)
    assert(plan.contains("TopKPerGroup (final)"), plan)
    assert(plan.contains("hashpartitioning(l_returnflag"), plan)
    assert(!plan.contains("SortExec") && !plan.toLowerCase.contains("\nsort"),
      s"top-k must not sort whole partitions:\n$plan")
    assert(!plan.contains("Window"), plan)
  }
}
