package graft

import org.apache.spark.sql.functions._

import graft.functions.DdSketch

/** The three properties that make DdSketch safe to precompute at scale:
  * merge-equals-direct (rollups never re-scan), partition-order
  * invariance (same answer on any cluster layout), and the relative-error
  * guarantee vs exact percentiles.
  */
class DdSketchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val prices = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))

  test("per-day sketches merged equal the direct whole-range sketch") {
    val direct = prices.agg(DdSketch.sketch(col("o_totalprice")).as("sk"))
      .head().getMap[Int, Long](0)
    val merged = prices.groupBy("day").agg(DdSketch.sketch(col("o_totalprice")).as("sk"))
      .agg(DdSketch.merge(col("sk")).as("sk"))
      .head().getMap[Int, Long](0)
    assert(merged.toSeq.sortBy(_._1) == direct.toSeq.sortBy(_._1))
  }

  test("sketch is partition-order invariant") {
    val a = prices.repartition(1).agg(DdSketch.sketch(col("o_totalprice")))
      .head().getMap[Int, Long](0)
    val b = prices.repartition(17, col("o_totalprice"))
      .agg(DdSketch.sketch(col("o_totalprice")))
      .head().getMap[Int, Long](0)
    assert(a.toSeq.sortBy(_._1) == b.toSeq.sortBy(_._1))
  }

  test("quantiles land within the relative-error guarantee of exact percentiles") {
    val values = prices.select("o_totalprice").as[Double].collect().sorted
    val sk = prices.agg(DdSketch.sketch(col("o_totalprice"))).head().getMap[Int, Long](0).toMap
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.95, 0.99)) {
      val exact = values(math.min(values.length - 1, math.ceil(q * values.length).toInt - 1).max(0))
      val est = DdSketch.quantile(sk, q)
      assert(math.abs(est - exact) <= DdSketch.Alpha * exact * 1.001,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("edge semantics: empty sketch is NaN; non-positive values bucket to 0.0") {
    assert(DdSketch.quantile(Map.empty, 0.5).isNaN)
    val sk = Seq(0.0, -5.0, 10.0).toDF("v").agg(DdSketch.sketch(col("v")))
      .head().getMap[Int, Long](0).toMap
    assert(sk(DdSketch.ZeroKey) == 2L)
    assert(DdSketch.quantile(sk, 0.1) == 0.0)
    val est10 = DdSketch.quantile(sk, 1.0)
    assert(math.abs(est10 - 10.0) <= DdSketch.Alpha * 10.0 * 1.001)
  }
}
