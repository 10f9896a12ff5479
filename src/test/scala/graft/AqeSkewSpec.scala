package graft

import org.apache.spark.sql.functions._

/** Pins the claim the scale notes make ("at 100x AQE handles skew
  * splitting"): a sort-merge join with one hot key must come out of AQE
  * with the skewed partition SPLIT (isSkew=true reads), not one straggler
  * task — the runtime half of the skew story, complementing the planned
  * salting of q79/q99.
  */
class AqeSkewSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0: 60k fact rows with a fat payload; 200 cold keys
      val facts = spark.range(0, 63000).select(
        when(col("id") < 60000, 0L).otherwise(col("id") % 200 + 1).as("k"),
        concat(lit("x" * 64), col("id").cast("string")).as("payload"))
      val dim = spark.range(0, 201).select(col("id").as("k"), col("id").cast("string").as("name"))
      val joined = facts.join(dim, "k")
      // collect() (not count()) so THIS Dataset's QueryExecution finalizes
      assert(joined.collect().length == 63000)
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ under forced confs:\n$plan")
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the join as skew-handled:\n$plan")
      assert(plan.contains("skewed"), // AQEShuffleRead ... skewed
        s"AQE did not split-read the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
