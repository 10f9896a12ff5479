package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k-per-group as a first-class operator (SURVEY.md §4 extension
  * point (c): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered through `SparkSessionExtensions` — the one extension rung
  * the engine had not yet exercised).
  *
  * The DataFrame idiom — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — shuffles EVERY row to its group's partition and
  * SORTS entire partitions, only to discard all but k rows per group. At
  * 100 TB that sort dominates. This operator plans like a partial
  * aggregation instead:
  *
  *   partial TopKPerGroupExec   (per input partition, bounded heaps)
  *     -> Exchange on group key (carries <= k rows per group PER INPUT
  *        PARTITION, not every row)
  *   final TopKPerGroupExec     (merges the survivors, emits k, sorted)
  *
  * State per partition is O(groups x k); no full sort anywhere — heap
  * insertion is O(log k) per row and only for rows that beat the group's
  * current k-th.
  *
  * Semantics contract: equivalent to the window filter when `order` is a
  * TOTAL order (callers supply tie-breaks), same as every other
  * deterministic-output query in this engine.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
    extends UnaryNode {
  require(groupExprs.nonEmpty,
    "TopKPerGroup needs group keys; global top-k is orderBy(...).limit(k) (TakeOrderedAndProject)")
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans the logical node into the two-stage physical form; the final
  * stage's required distribution makes EnsureRequirements insert the
  * group-key exchange between the stages. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerGroup (partial)" else "TopKPerGroup (final)"

  override protected def doExecute(): RDD[InternalRow] = {
    val g = groupExprs
    val o = order
    val kk = k
    val attrs = child.output
    val emitSorted = !partial
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, attrs)
      val ord = RowOrdering.create(o, attrs)
      // One bounded heap per group; the head is the WORST of the current
      // best-k (reversed comparator), so admission is a single compare.
      val heaps = new java.util.HashMap[UnsafeRow, JPriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new JPriorityQueue[InternalRow](kk + 1, ord.reversed())
          heaps.put(key.copy(), heap) // iterator reuses backing rows: copy keys...
        }
        if (heap.size() < kk) heap.offer(row.copy()) // ...and retained rows
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = h.toArray(new Array[InternalRow](h.size()))
        if (emitSorted) java.util.Arrays.sort(arr, ord)
        arr.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
