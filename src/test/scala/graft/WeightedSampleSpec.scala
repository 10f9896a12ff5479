package graft

import org.apache.spark.sql.functions._

import graft.ops.WeightedSample

/** Weighted reservoir sampling contract: cap per group, determinism,
  * weight-proportional selection pressure, growth stability, and the
  * invalid-weight guard. */
class WeightedSampleSpec extends SparkSuite {
  import spark.implicits._

  // 4 groups x 500 rows; weight 10 for ids % 5 == 0 (20%), else 1
  private lazy val rows =
    (0L until 2000L).map(i => (s"g${i % 4}", i, if (i % 5 == 0) 10.0 else 1.0))
      .toDF("grp", "id", "w")

  test("at most k rows per group, deterministic across invocations") {
    val a = WeightedSample.kPerGroup(rows, Seq("grp"), "id", "w", 25)
    val b = WeightedSample.kPerGroup(rows, Seq("grp"), "id", "w", 25)
    val ga = a.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(ga.values.forall(_ == 25L), s"cap violated: $ga")
    assert(a.select("id").as[Long].collect().sorted.toSeq ==
      b.select("id").as[Long].collect().sorted.toSeq)
  }

  test("selection pressure follows weight: 10x-weighted rows dominate the sample") {
    val got = WeightedSample.kPerGroup(rows, Seq("grp"), "id", "w", 25)
    val heavy = got.filter(col("w") === 10.0).count().toDouble
    val light = got.filter(col("w") === 1.0).count().toDouble
    // heavy rows are 20% of the population but weight 10x: expected to
    // take the large majority of the 100 slots
    assert(heavy > light, s"heavy=$heavy light=$light")
    assert(heavy / (heavy + light) > 0.5)
  }

  test("growth stability: new rows can only displace, never reshuffle") {
    val before = WeightedSample.kPerGroup(rows, Seq("grp"), "id", "w", 25)
      .select("id").as[Long].collect().toSet
    val grown = rows.unionByName(
      (2000L until 2400L).map(i => (s"g${i % 4}", i, 1.0)).toDF("grp", "id", "w"))
    val after = WeightedSample.kPerGroup(grown, Seq("grp"), "id", "w", 25)
      .select("id").as[Long].collect().toSet
    assert(after.subsetOf(before ++ (2000L until 2400L)),
      "an existing row outside the old sample entered without its key changing")
  }

  test("NULL and non-positive weights are excluded, sampling proceeds") {
    val mixed = Seq(("g", 1L, Some(2.0)), ("g", 2L, None), ("g", 3L, Some(0.0)),
      ("g", 4L, Some(-1.0)), ("g", 5L, Some(1.0))).toDF("grp", "id", "w")
    val got = WeightedSample.kPerGroup(mixed, Seq("grp"), "id", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 5L))
  }
}
