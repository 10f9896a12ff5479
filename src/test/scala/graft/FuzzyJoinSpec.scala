package graft

import org.apache.spark.sql.functions._

import graft.ops.FuzzyJoin

/** Deletion-neighborhood blocking is COMPLETE for edit distance <= 1 —
  * asserted against brute force — and never plans a cross product. */
class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  test("each edit kind pairs up; distance-2 stays out") {
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"),   // substitution -> dist 1
      (3L, "abc"), (4L, "abcd"),        // insertion    -> dist 1
      (5L, "abc"),                      // duplicate of 3 -> dist 0
      (6L, "azcd"),                     // dist 2 from abc, 1 from abcd
      (7L, "zzzzz")                     // unrelated
    ).toDF("k", "s")
    val got = FuzzyJoin.editDistance1Pairs(rows, "k", "s")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (3L, 4L, 1), (3L, 5L, 0), (4L, 5L, 1), (4L, 6L, 1)))
  }

  test("matches brute-force levenshtein join on the supplier fixture") {
    val sup = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select(col("s_suppkey").as("k"), col("s_name").as("s"))
    val got = FuzzyJoin.editDistance1Pairs(sup, "k", "s")
      .as[(Long, Long, Int)].collect().toSet
    val a = sup.select(col("k").as("a_k"), col("s").as("a_s"))
    val b = sup.select(col("k").as("b_k"), col("s").as("b_s"))
    val brute = a.join(b, col("a_k") < col("b_k"))
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")))
      .filter(col("dist") <= 1)
      .select("a_k", "b_k", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(brute.nonEmpty, "fixture produced no near-pairs; test is vacuous")
    assert(got == brute)
  }

  test("the candidate plan never cross-products") {
    val sup = spark.read.parquet(s"$sf0001/supplier.parquet")
    val df = FuzzyJoin.editDistance1Pairs(sup, "s_suppkey", "s_name")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join planned a cross product:\n$plan")
  }
}
