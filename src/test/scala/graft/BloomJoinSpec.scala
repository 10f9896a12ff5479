package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.BloomJoin

/** Runtime Bloom semi-join reduction: result equality with the plain
  * join, actual pre-exchange row reduction, FPR sanity, composite keys,
  * and null-key semantics. */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // fact: 20k rows over 2000 keys; dim: a 40-key slice (2% selective)
  private lazy val fact =
    (1 to 20000).map(i => (i % 2000L, i.toLong)).toDF("k", "v")
  private lazy val dim =
    (0L until 2000L by 50L).map(k => (k, s"d$k")).toDF("k", "name")

  test("pruneAndJoin returns exactly the plain join's rows") {
    val got = BloomJoin.pruneAndJoin(fact, dim, Seq("k"))
    val plain = fact.join(dim, Seq("k"))
    assert(sortedRows(got) == sortedRows(plain))
    assert(got.count() == 400L) // 40 dim keys x 10 fact rows each
  }

  test("semiFilter cuts the pre-exchange row count to ~ the semi-join footprint") {
    val kept = BloomJoin.semiFilter(fact, dim, Seq("k")).count()
    // true footprint 400; FPR ~0.3% of the other 19600 rows ≈ 60 — allow 5x
    assert(kept >= 400L && kept <= 400L + 300L,
      s"expected ~400 (+small FPR), got $kept of 20000")
  }

  test("composite keys hash as one tuple on both sides") {
    val f2 = (1 to 5000).map(i => (i % 50L, (i % 7).toString, i.toLong)).toDF("a", "b", "v")
    val d2 = Seq((3L, "2", "x"), (10L, "5", "y"), (49L, "0", "z")).toDF("a", "b", "t")
    val got = BloomJoin.pruneAndJoin(f2, d2, Seq("a", "b"))
    val plain = f2.join(d2, Seq("a", "b"))
    assert(sortedRows(got) == sortedRows(plain))
    assert(got.count() > 0, "fixture must actually match rows")
  }

  test("null fact keys never survive the probe (inner-join semantics)") {
    val fn = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("k", "v")
    val dn = Seq((1L, "d1"), (2L, "d2")).toDF("k", "name")
    val kept = BloomJoin.semiFilter(fn, dn, Seq("k"))
    assert(kept.select("v").as[String].collect().toSet == Set("a", "c"))
  }

  test("the probe sits under the exchange in the plan (filter-before-shuffle)") {
    // repartition breaks ConvertToLocalRelation (which would eagerly
    // evaluate the probe at optimize time) and the broadcast threshold is
    // lowered so the join actually shuffles — the case the op exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // parquet-backed inputs: a LocalRelation would let the optimizer
      // evaluate the probe filter eagerly and erase it from the plan
      val base = java.nio.file.Files.createTempDirectory("bloomjoin").toString
      fact.write.parquet(s"$base/fact"); dim.write.parquet(s"$base/dim")
      val joined = BloomJoin.pruneAndJoin(
        spark.read.parquet(s"$base/fact"), spark.read.parquet(s"$base/dim"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      val probeAt = plan.indexOf("bloom_probe")
      val exchangeAt = plan.indexOf("Exchange hashpartitioning")
      assert(probeAt >= 0, s"bloom_probe missing from plan:\n$plan")
      assert(exchangeAt >= 0, s"expected a shuffle join:\n$plan")
      // executedPlan prints top-down: the probe filter must appear BELOW
      // (after, in print order) the shuffle it feeds
      assert(probeAt > exchangeAt, s"probe must run before the exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
