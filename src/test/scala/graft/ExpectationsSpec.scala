package graft

import org.apache.spark.sql.functions._

import graft.ops.Expectations
import graft.ops.Expectations.{Expectation, ratio}

/** Data-quality audit ([[Expectations.audit]]): hand-computed verdicts,
  * single-job execution, and input validation. */
class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10),
    (2L, Some("b"), 20),
    (3L, None, 30),
    (3L, Some("d"), 999)
  ).toDF("id", "name", "v")

  test("hand-computed values, bounds, and pass flags") {
    val byName = Expectations.audit(df, Seq(
      Expectation("id_unique", count_distinct(col("id")).cast("double") / count(lit(1)), 1.0, 1.0),
      Expectation("name_nonnull", ratio(col("name").isNotNull), 0.9, 1.0),
      Expectation("v_in_range", ratio(col("v").between(0, 100)), 0.5, 1.0)
    )).collect().map(r => r.getAs[String]("check_name") ->
      ((r.getAs[Double]("value"), r.getAs[Boolean]("pass")))).toMap
    assert(byName("id_unique") == ((0.75, false))) // 3 distinct / 4 rows
    assert(byName("name_nonnull") == ((0.75, false)))
    assert(byName("v_in_range") == ((0.75, true)))
    assert(byName.size == 3)
  }

  test("the whole audit is ONE aggregation job (single scan)") {
    val checks = Seq(
      Expectation("a", ratio(col("v") > 0), 0.0, 1.0),
      Expectation("b", ratio(col("name").isNotNull), 0.0, 1.0),
      Expectation("c", avg(col("v")), 0.0, 1e9))
    val plan = Expectations.audit(df, checks).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected one scan of the audited table, got ${scans.size}")
  }

  test("boundary values are inclusive") {
    val got = Expectations.audit(df, Seq(
      Expectation("exact", ratio(col("v") > 0), 1.0, 1.0)))
      .select("pass").as[Boolean].head()
    assert(got) // value is exactly 1.0 → inclusive bounds pass
  }

  test("rejects duplicate or invalid names and empty bounds") {
    intercept[IllegalArgumentException] {
      Expectations.audit(df, Seq(
        Expectation("x", count(lit(1)), 0, 1), Expectation("x", count(lit(1)), 0, 1)))
    }
    intercept[IllegalArgumentException] { Expectation("bad name!", count(lit(1)), 0, 1) }
    intercept[IllegalArgumentException] { Expectation("empty", count(lit(1)), 2, 1) }
    intercept[IllegalArgumentException] { Expectations.audit(df, Nil) }
  }
}
