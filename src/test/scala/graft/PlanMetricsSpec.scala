package graft

import org.apache.spark.sql.functions._

import graft.tools.PlanMetrics

/** The metric accounting must report what the plan actually did — scans,
  * shuffle volume, pruning — not merely run. */
class PlanMetricsSpec extends SparkSuite {
  import spark.implicits._

  test("a grouped query reports its scan and shuffle volumes") {
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val s = PlanMetrics.run(df)
    assert(s.filesRead >= 1)
    assert(s.bytesRead > 0)
    // the shuffle carries the partial aggregates: at least one record per
    // (partition, status), far fewer than the input rows
    val input = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(s.shuffleRecordsWritten > 0 && s.shuffleRecordsWritten < input,
      s"shuffle=${s.shuffleRecordsWritten} input=$input")
    assert(s.spillBytes == 0) // nothing here should spill locally
  }

  test("partition pruning is visible as fewer files read") {
    val base = java.nio.file.Files.createTempDirectory("pm").toString
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
    graft.io.Sinks.parquet(o, s"$base/fact", partitionBy = Seq("y"))
    val all = PlanMetrics.run(spark.read.parquet(s"$base/fact"))
    val oneYear = PlanMetrics.run(
      spark.read.parquet(s"$base/fact").filter(col("y") === 1995))
    assert(oneYear.filesRead > 0 && oneYear.filesRead < all.filesRead,
      s"pruned=${oneYear.filesRead} all=${all.filesRead}")
    assert(oneYear.bytesRead < all.bytesRead)
  }

  test("a broadcast join reports zero shuffle records") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet").select("l_orderkey", "l_quantity")
    // a filter, not limit(n): a global limit would itself shuffle n rows
    val o = spark.read.parquet(s"$sf0001/orders.parquet").select("o_orderkey")
      .filter(col("o_orderkey") < 100)
    val joined = li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
    val s = PlanMetrics.run(joined)
    assert(s.shuffleRecordsWritten == 0, s"broadcast join shuffled: ${s.shuffleRecordsWritten}")
    assert(s.outputRows > 0)
  }
}
