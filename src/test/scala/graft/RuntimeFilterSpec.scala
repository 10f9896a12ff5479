package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter): when a
  * selectively-filtered dimension shuffle-joins a large fact table, the
  * optimizer builds a bloom filter from the dim side's join keys and
  * applies it as a semi-join reduction on the FACT SIDE SCAN — rows that
  * cannot match are dropped before the shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * ~matching fraction; it composes with dynamic partition pruning (which
  * only helps when the join key IS the partition key — the bloom filter
  * covers every other join).
  *
  * The production thresholds (creation side < 10 MB, application side
  * scan > 10 GB) are exactly right at cluster scale and unreachable in a
  * local fixture, so the spec lowers the application-side threshold to
  * prove the MECHANISM fires and results stay correct.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("selective dim filter injects a bloom filter into the fact-side scan") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val part = spark.read.parquet(s"$sf0001/part.parquet")
      .filter(col("p_brand") === "Brand#11") // selective creation-side predicate
      .select("p_partkey", "p_brand")

    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local fixture is far below the 10 GB production threshold
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: broadcast joins don't need the reduction
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum("l_quantity").as("qty"))
      val rows = joined.collect()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter"),
        s"no bloom filter injected:\n$optimized")
      // Semantics unchanged: same result with the runtime filter disabled.
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum("l_quantity").as("qty"))
        .collect()
      assert(rows.map(_.toString).sorted.toSeq == plain.map(_.toString).sorted.toSeq)
      assert(rows.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
