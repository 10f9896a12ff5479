package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.ops.BudgetSelect

/** Token-budget selection ([[BudgetSelect.selectByBudget]]): hand-computed
  * boundary cases (cell straddle, bucket straddle, zero/full budgets) and
  * exact equality with the naive global-window selection on the fixture —
  * the refinement must reproduce the banned plan's answer, never its
  * shape. */
class BudgetSelectSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed: budget splits a quality cell and an id bucket") {
    // quality 2 cell: ids 1,2 (tok 5,5); quality 1 cell: ids 3,4,5 (tok 4,4,4)
    val df = Seq(
      (1L, 2L, 5L), (2L, 2L, 5L), (3L, 1L, 4L), (4L, 1L, 4L), (5L, 1L, 4L)
    ).toDF("id", "q", "tok")
    // total=22; budget = 22*3/4 = 16 → all of q=2 (10), then ids 3 (14) — id 4 would hit 18 > 16
    val got = BudgetSelect
      .selectByBudget(df, col("q"), col("tok"), "id", 3, 4)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("zero budget selects nothing; full budget selects everything") {
    val df = Seq((1L, 1L, 3L), (2L, 2L, 3L)).toDF("id", "q", "tok")
    assert(BudgetSelect.selectByBudget(df, col("q"), col("tok"), "id", 0, 1).count() == 0)
    assert(BudgetSelect.selectByBudget(df, col("q"), col("tok"), "id", 1, 1).count() == 2)
    // budget larger than total behaves as select-all too
    assert(BudgetSelect.selectByBudget(df, col("q"), col("tok"), "id", 7, 2).count() == 2)
  }

  test("ids far apart (different id buckets) still cut exactly in order") {
    // same quality cell, ids straddle many 4096-wide buckets
    val df = Seq(
      (10L, 1L, 10L), (5000L, 1L, 10L), (9000L, 1L, 10L), (200000L, 1L, 10L)
    ).toDF("id", "q", "tok")
    val got = BudgetSelect
      .selectByBudget(df, col("q"), col("tok"), "id", 1, 2) // budget 20 of 40
      .select("id").as[Long].collect().toSet
    assert(got == Set(10L, 5000L))
  }

  test("matches the naive global-window selection on the fixture corpus") {
    val docs = Tables.documents(spark, sf0001)
    val tok = expr("cast(size(split(text, ' ')) as bigint)")
    val qgrid = expr(
      "(1000000L * cast(size(array_distinct(split(text, ' '))) as bigint))" +
        " div cast(size(split(text, ' ')) as bigint)")
    val got = BudgetSelect.selectByBudget(docs, qgrid, tok, "doc_id", 2, 5)
      .select("doc_id").as[Long].collect().toSet

    val base = docs.select(
      col("doc_id"), qgrid.as("q"), tok.as("tok"))
    val total = base.agg(sum("tok")).as[Long].head()
    val budget = total * 2 / 5
    val naive = base
      .withColumn("cum", sum(col("tok")).over(
        Window.orderBy(col("q").desc, col("doc_id"))))
      .filter(col("cum") <= budget)
      .select("doc_id").as[Long].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty && got.size < docs.count())
  }
}
