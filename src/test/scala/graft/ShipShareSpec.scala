package graft

import org.apache.spark.sql.functions._

/** Targeted checks for q283 (ship-lag percentiles) and q284
  * (share-of-parent rollup). */
class ShipShareSpec extends SparkSuite {

  test("q283: per-priority counts cover every lineitem and quantiles are ordered") {
    val rows = SparkEntry.queries("q283_ship_lag_priority")(spark, sf0001).collect()
    val liCount = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == liCount)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_d") <= r.getAs[Double]("p90_d"))
      assert(r.getAs[Double]("p90_d") <= r.getAs[Int]("max_d").toDouble)
    }
  }

  test("q284: shares sum to 1 within each region; revenue conserved") {
    val rows = SparkEntry.queries("q284_share_of_parent")(spark, sf0001).collect()
    rows.groupBy(_.getAs[String]("region")).foreach { case (region, xs) =>
      val s = xs.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$region shares sum to $s")
    }
    val total = rows.map(_.getAs[Double]("revenue")).sum
    val expected = spark.read.parquet(s"$sf0001/orders.parquet")
      .agg(sum("o_totalprice")).collect()(0).getDouble(0)
    assert(math.abs(total - expected) < 1.0) // every order's customer resolves
  }

  test("q284: dimension joins broadcast; no sort-merge join of a dim") {
    val df = SparkEntry.queries("q284_share_of_parent")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
