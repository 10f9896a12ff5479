package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Sinks

/** Storage-layout levers for scale: bucketed shuffle-free joins and
  * partition-pruned reads, both asserted against the physical plan.
  */
class StorageSpec extends SparkSuite {

  test("bucketed tables join with zero shuffle exchanges") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Sinks.bucketedTable(li, "li_bucketed", Seq("l_orderkey"), 8)
    Sinks.bucketedTable(o, "o_bucketed", Seq("o_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // row-level equality with the plain join
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey")).count()
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("partitioned parquet reads prune to the filtered partitions") {
    val out = Files.createTempDirectory("part").toString + "/orders_by_year"
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
    Sinks.parquet(o, out, partitionBy = Seq("y"))
    val read = spark.read.parquet(out).filter(col("y") === 1997)
    read.collect()
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("(y#") || plan.contains("y = 1997") || plan.contains("equals(y"),
      s"no partition filter:\n$plan")
    val expected = o.filter(col("y") === 1997).count()
    assert(read.count() == expected)
  }
}
