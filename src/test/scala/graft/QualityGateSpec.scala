package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityGate
import graft.ops.QualityGate.{MaxFractionWhere, MaxNullFraction, MinRows}

class QualityGateSpec extends SparkSuite {
  import spark.implicits._

  private val clean = Seq(
    (1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)), (4L, Some(40.0))
  ).toDF("id", "v")

  test("clean data passes; metrics come from the materializing action") {
    val (gated, report) = QualityGate.attach(clean, Seq(
      MinRows(3),
      MaxNullFraction("v", 0.25),
      MaxFractionWhere("v_out_of_range", col("v") > 100, 0.0)))
    gated.write.format("noop").mode("overwrite").save()
    assert(report() == Nil)
  }

  test("each rule fires with the observed value and its bound") {
    val dirty = Seq(
      (1L, Some(10.0)), (2L, None: Option[Double]), (3L, Some(999.0))
    ).toDF("id", "v")
    val (gated, report) = QualityGate.attach(dirty, Seq(
      MinRows(5),                                      // 3 < 5
      MaxNullFraction("v", 0.1),                       // 1/3 > 0.1
      MaxFractionWhere("v_out_of_range", col("v") > 100, 0.0))) // 1/3 > 0
    gated.write.format("noop").mode("overwrite").save()
    val vs = report().map(v => v.rule -> v.value).toMap
    assert(vs.keySet == Set("min_rows_5", "null_frac_v", "frac_v_out_of_range"))
    assert(vs("min_rows_5") == 3.0)
    assert(math.abs(vs("null_frac_v") - 1.0 / 3) < 1e-9)
    assert(math.abs(vs("frac_v_out_of_range") - 1.0 / 3) < 1e-9)
  }

  test("gating adds no extra Spark job over the bare write") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    def countJobs(group: String)(action: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try action
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val bare = countJobs("qg_bare")(df.write.format("noop").mode("overwrite").save())
    val (gated, report) = QualityGate.attach(df, Seq(MinRows(1), MaxNullFraction("l_quantity", 0.0)))
    val observed = countJobs("qg_observed")(gated.write.format("noop").mode("overwrite").save())
    assert(observed == bare, s"observe added jobs: bare=$bare observed=$observed")
    assert(report() == Nil)
  }
}
