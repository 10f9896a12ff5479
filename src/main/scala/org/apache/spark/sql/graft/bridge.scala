package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column <-> Expression converters —
  * the standard extension-library pattern for shipping custom Catalyst
  * expressions (the public API exposes no constructor from Expression).
  */
object bridge {
  /** `AbstractDataType` is `private[sql]`; alias it here so expressions in
    * graft.functions can declare `inputTypes` (ExpectsInputTypes) and get
    * analyzer implicit casts instead of hand-rolled type checks. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly lowers a composed Column to a catalyst expression tree.
    * `expression` defers behind a `ColumnNodeExpression` wrapper, which the
    * analyzer only unwraps on Dataset API paths — an expression returned
    * from a `FunctionRegistry` builder (SparkSessionExtensions
    * `injectFunction`) must already be a real tree, so convert up front;
    * the embedded `UnresolvedFunction`s resolve in the next analyzer pass. */
  def lower(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a hand-built LogicalPlan (e.g. a custom operator node) as a
    * DataFrame — the `private[sql]` constructor custom plans require. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Decompose a DSv2 bucket transform (`CLUSTERED BY ... INTO n
    * BUCKETS` arrives as one) — the extractor object is `private[sql]`. */
  def bucketTransform(
      t: org.apache.spark.sql.connector.expressions.Transform): Option[(Int, Seq[String])] =
    t match {
      case org.apache.spark.sql.connector.expressions.BucketTransform(n, cols, sorted)
          if sorted.isEmpty =>
        Some((n, cols.map(_.fieldNames.mkString("."))))
      case _ => None
    }

  /** Re-wrap a batch DataFrame as a STREAMING one (isStreaming=true) for
    * a v1 `Source.getBatch` return — the engine asserts the flag, and
    * `internalCreateDataFrame` over the plan's RDD is the standard v1
    * construction (execution stays lazy; the RDD is only planned here). */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
