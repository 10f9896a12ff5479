package graft

import org.apache.spark.sql.functions._

/** Targeted checks for q287 (cohort LTV) and q288 (RFM segmentation). */
class LtvRfmSpec extends SparkSuite {

  test("q287: LTV accumulates monotonically and totals the purchase revenue of signup users") {
    val rows = SparkEntry.queries("q287_cohort_ltv")(spark, sf0001).collect()
    rows.groupBy(_.getAs[String]("cohort_week")).foreach { case (ck, xs) =>
      val byOffset = xs.sortBy(_.getAs[Int]("offset_w"))
      val ltv = byOffset.map(_.getAs[Double]("ltv_per_user"))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => a <= b + 1e-9 },
        s"$ck: LTV not monotone")
      assert(byOffset.map(_.getAs[Long]("n_users")).distinct.length == 1)
    }
    // conservation: sum of per-offset revenue == all purchases by signup
    // users at or after their signup day
    val ev = graft.core.Tables.events(spark, sf0001)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("c_day"))
    val expected = ev.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(to_date(col("ts")) >= col("c_day"))
      .agg(sum("value")).collect()(0).getDouble(0)
    val got = rows.map(_.getAs[Double]("revenue")).sum
    assert(math.abs(got - expected) < 0.01)
  }

  test("q288: quintile scores are 1..5, balanced-ish, and ordered with the raw metric") {
    val rows = SparkEntry.queries("q288_rfm_segmentation")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    Seq("score_r", "score_f", "score_m").foreach { c =>
      assert(rows.forall(r => r.getAs[Int](c) >= 1 && r.getAs[Int](c) <= 5))
    }
    // monotone: a strictly larger monetary can never score lower
    val byMon = rows.sortBy(_.getAs[Double]("monetary"))
    byMon.sliding(2).foreach {
      case Array(a, b) =>
        if (b.getAs[Double]("monetary") > a.getAs[Double]("monetary"))
          assert(b.getAs[Int]("score_m") >= a.getAs[Int]("score_m"))
      case _ =>
    }
    // recency: fewer days since last purchase can never score lower
    val byRec = rows.sortBy(-_.getAs[Int]("r_days"))
    byRec.sliding(2).foreach {
      case Array(a, b) =>
        if (b.getAs[Int]("r_days") < a.getAs[Int]("r_days"))
          assert(b.getAs[Int]("score_r") >= a.getAs[Int]("score_r"))
      case _ =>
    }
    // rfm code is exactly the three digits
    rows.foreach { r =>
      assert(r.getAs[String]("rfm") ==
        s"${r.getAs[Int]("score_r")}${r.getAs[Int]("score_f")}${r.getAs[Int]("score_m")}")
    }
  }
}
