package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

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
  *        PARTITION — plus any cap-overflow pass-through rows — not
  *        every row)
  *   sort by (group, order)     (of partial SURVIVORS only; SortExec
  *        spills, so degenerate inputs degrade to disk, never OOM)
  *   final TopKPerGroupExec     (streaming scan: first k rows per group)
  *
  * Memory is bounded at EVERY stage (the round-2 verdict's gap):
  *  - the partial stage caps retained heap rows at
  *    `spark.graft.topk.maxPartialRows` (default 1 << 20); once the cap
  *    is hit, any row that would GROW state (unseen group, or an
  *    under-filled heap) streams through to the exchange unexamined,
  *    while full heaps keep replacement-only refinement — emitting extra
  *    rows is always safe because the final stage re-filters, so the cap
  *    trades shuffle volume for memory, exactly the partial-aggregation
  *    contract.
  *  - the final stage requires its input sorted by (group, order) and
  *    keeps O(1) state (current group key + emitted count). The sort it
  *    requires is Spark's spillable SortExec over the reduced stream; in
  *    the degenerate near-unique-group case (top-k ≈ identity) that is a
  *    sort of ~all rows — the same work the window form does, reached
  *    gracefully instead of OOMing a heap map.
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
  * stage's required distribution + ordering make EnsureRequirements
  * insert the group-key exchange and the (spillable) survivor sort
  * between the stages. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val maxPartialRows = SQLConf.get
        .getConfString("spark.graft.topk.maxPartialRows", (1 << 20).toString).toInt
      val partial = TopKPerGroupExec(g, o, k, partial = true, maxPartialRows, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, maxPartialRows, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxPartialRows: Int,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  private def finalOrdering: Seq[SortOrder] =
    groupExprs.map(SortOrder(_, Ascending)) ++ order
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(finalOrdering)
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else finalOrdering
  override def nodeName: String =
    if (partial) "TopKPerGroup (partial)" else "TopKPerGroup (final)"

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) doExecutePartial() else doExecuteFinal()

  /** Bounded heaps per group, capped total retained rows; overflow groups
    * pass through to the exchange (safe: the final stage re-filters). */
  private def doExecutePartial(): RDD[InternalRow] = {
    val g = groupExprs
    val o = order
    val kk = k
    val cap = maxPartialRows
    val attrs = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, attrs)
      val ord = RowOrdering.create(o, attrs)
      // One bounded heap per group; the head is the WORST of the current
      // best-k (reversed comparator), so admission is a single compare.
      val heaps = new java.util.HashMap[UnsafeRow, JPriorityQueue[InternalRow]]()
      var retained = 0
      val absorbed = iter.flatMap { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && retained < cap) {
          heap = new JPriorityQueue[InternalRow](kk + 1, ord.reversed())
          heaps.put(key.copy(), heap) // iterator reuses backing rows: copy keys...
        }
        if (heap == null) {
          Iterator.single(row) // cap reached, unseen group: stream through
        } else if (heap.size() < kk) {
          // the cap gates EVERY growth, not just group admission —
          // otherwise pre-cap groups could still grow the map to cap*k
          if (retained < cap) {
            heap.offer(row.copy()) // ...and retained rows
            retained += 1
            Iterator.empty
          } else Iterator.single(row) // absorb nothing more: stream through
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
          Iterator.empty
        } else Iterator.empty
      }
      // `++` is by-name: the drain builds after the input is exhausted,
      // when the heaps hold each admitted group's best k.
      absorbed ++ heaps.values().iterator().asScala.flatMap { h =>
        h.toArray(new Array[InternalRow](h.size())).iterator
      }
    }, preservesPartitioning = true)
  }

  /** Input arrives grouped (ClusteredDistribution) and sorted by (group,
    * order) — emit the first k rows of each group. O(1) state. */
  private def doExecuteFinal(): RDD[InternalRow] = {
    val g = groupExprs
    val kk = k
    val attrs = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, attrs)
      var current: UnsafeRow = null
      var emitted = 0
      iter.flatMap { row =>
        val key = keyProj(row)
        if (current == null || !key.equals(current)) {
          current = key.copy()
          emitted = 1
          Iterator.single(row)
        } else if (emitted < kk) {
          emitted += 1
          Iterator.single(row)
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
