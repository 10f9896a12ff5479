package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalRank

/** GlobalRank (distributed two-pass ranking) vs Spark's reference
  * single-window results — equality on every derived analytic, plus the
  * edge cases the stitch has to survive: ties on the leading order column,
  * totals smaller than the ntile bucket count, empty input, and bucket
  * boundaries (lead patch).
  */
class GlobalRankSpec extends SparkSuite {
  import org.apache.spark.sql.DataFrame

  private def customers: DataFrame =
    graft.core.Tables.customer(spark, sf0001)

  test("global row number matches single-window row_number on customer") {
    val r = GlobalRank
      .ranked(customers, col("c_acctbal"), Seq(col("c_custkey")))
      .select(col("c_custkey"), col("_grn"))
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val expected = customers
      .select(col("c_custkey"), row_number().over(w).cast("long").as("_grn"))
    assert(r.except(expected).isEmpty && expected.except(r).isEmpty)
  }

  test("ntile matches single-window NTILE, including a non-divisible n") {
    for (n <- Seq(7, 10)) {
      val r = GlobalRank
        .ranked(customers, col("c_acctbal"), Seq(col("c_custkey")))
        .withColumn("t", GlobalRank.ntileExpr(n))
        .select(col("c_custkey"), col("t"))
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      val expected = customers.select(col("c_custkey"), ntile(n).over(w).as("t"))
      assert(r.except(expected).isEmpty && expected.except(r).isEmpty, s"ntile($n)")
    }
  }

  test("lead stitch patches bucket boundaries (matches single-window LEAD)") {
    val r = GlobalRank
      .ranked(customers, col("c_acctbal"), Seq(col("c_custkey")), leadCol = Some("c_acctbal"))
      .withColumn("nb", GlobalRank.leadExpr("c_acctbal", Seq(col("c_acctbal"), col("c_custkey"))))
      .select(col("c_custkey"), col("nb"))
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val expected = customers.select(col("c_custkey"), lead(col("c_acctbal"), 1).over(w).as("nb"))
    assert(r.except(expected).isEmpty && expected.except(r).isEmpty)
  }

  test("ties on the leading order column never split a rank run") {
    import spark.implicits._
    // heavy ties: 500 rows over 3 distinct leading values
    val df = (1 to 500).map(i => (i % 3 * 1.0, i.toLong)).toDF("v", "id")
    val r = GlobalRank
      .ranked(df, col("v"), Seq(col("id")))
      .select(col("id"), col("_grn"))
    val expected = df.select(
      col("id"), row_number().over(Window.orderBy(col("v"), col("id"))).cast("long").as("_grn"))
    assert(r.except(expected).isEmpty && expected.except(r).isEmpty)
  }

  test("n larger than the row count assigns one tile per row") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i * 1.0, i)).toDF("v", "id")
    val got = GlobalRank
      .ranked(df, col("v"), Seq(col("id")))
      .withColumn("t", GlobalRank.ntileExpr(10))
      .select(col("id"), col("t"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == (1L to 5L).map(i => (i, i.toInt)))
  }

  test("empty input yields empty output (null percentile bounds path)") {
    import spark.implicits._
    val df = Seq.empty[(Double, Long)].toDF("v", "id")
    val r = GlobalRank.ranked(df, col("v"), Seq(col("id")))
    assert(r.count() == 0)
  }
}
