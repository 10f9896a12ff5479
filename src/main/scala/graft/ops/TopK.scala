package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graft.bridge

import graft.plans.TopKPerGroup

/** Scala API over the [[graft.plans.TopKPerGroup]] custom operator. */
object TopK {

  /** The k first rows of each group under `orderCols` (callers supply
    * tie-breaking order columns for deterministic output, e.g.
    * `Seq(col("price").desc, col("id"))`). Plans as partial-heap ->
    * group-key exchange -> final-heap; see the operator's Scaladoc for
    * why this beats the `row_number()` window at scale. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    val order = orderCols.map(c => bridge.lower(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    bridge.ofRows(
      df.sparkSession,
      TopKPerGroup(groupCols.map(bridge.lower), order, k, df.queryExecution.logical))
  }
}
