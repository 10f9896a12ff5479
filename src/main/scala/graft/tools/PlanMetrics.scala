package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Executed-plan metric accounting — the observability layer that turns
  * "read the explain output" into assertable numbers. Executes the frame
  * against the noop sink (full plan, nothing dropped) and folds every
  * operator's SQLMetrics into a per-node table plus the totals that
  * matter for scale work:
  *
  *  - `filesRead` / `bytesRead`: what the scans actually touched — the
  *    pruning levers (partition/file/footer skipping) show up HERE, not
  *    in wall time;
  *  - `shuffleBytesWritten` / `shuffleRecordsWritten`: what crossed the
  *    wire — the first number to shrink on a 100 TB plan;
  *  - `spillBytes`: memory pressure made visible (a silent 10× slowdown
  *    locally becomes an OOM at cluster scale).
  *
  * Metrics read AFTER execution on the final adaptive plan, so AQE
  * re-plans are reflected. Driver-side; use on the ops/debug path.
  */
object PlanMetrics {

  final case class NodeMetrics(node: String, metrics: Map[String, Long])

  final case class Summary(
      nodes: Seq[NodeMetrics],
      filesRead: Long,
      bytesRead: Long,
      outputRows: Long,
      shuffleBytesWritten: Long,
      shuffleRecordsWritten: Long,
      spillBytes: Long,
      /** `Dataset.observe` metrics the query declared on INTERIOR
        * relations, flattened to `observationName.column -> value`.
        * Operator-internal cardinalities (e.g. [[graft.ops.SetSimJoin]]'s
        * candidate-pair count) live here — a corpus-shape drift toward a
        * quadratic regime is attributable from the bench artifact alone,
        * without re-profiling. Numeric columns only. */
      observed: Map[String, Long] = Map.empty)

  /** Pre-order walk that descends through the AQE wrappers `collect`
    * cannot see past: AdaptiveSparkPlanExec holds its final plan out of
    * band, and every QueryStageExec is a LEAF wrapping its stage's
    * subtree. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  /** Execute `df` and account its final plan. Execution goes through the
    * frame's OWN QueryExecution (`toRdd` + a no-op job) — a sink write
    * would plan a fresh QueryExecution and leave THIS plan's metrics
    * untouched. Rows never reach the driver. */
  def run(df: DataFrame): Summary = {
    // the iterator must be DRAINED: codegen pipelines produce lazily, so
    // an unconsumed partition would execute nothing upstream of it
    df.queryExecution.toRdd.foreachPartition(it => it.foreach(_ => ()))
    val nodes = flatten(df.queryExecution.executedPlan).map { n =>
      NodeMetrics(n.nodeName, n.metrics.map { case (k, m) => k -> m.value }.toMap)
    }
    def total(pred: (String, String) => Boolean): Long =
      nodes.flatMap(n => n.metrics.collect { case (k, v) if pred(n.node, k) => v }).sum
    Summary(
      nodes,
      filesRead = total((n, k) => n.contains("Scan") && k == "numFiles"),
      bytesRead = total((n, k) => n.contains("Scan") && k == "filesSize"),
      // pre-order: the first operator carrying numOutputRows is the
      // top-most one — the query's output cardinality
      outputRows = nodes.find(_.metrics.contains("numOutputRows"))
        .flatMap(_.metrics.get("numOutputRows")).getOrElse(0L),
      shuffleBytesWritten = total((_, k) => k == "shuffleBytesWritten"),
      shuffleRecordsWritten = total((_, k) => k == "shuffleRecordsWritten"),
      spillBytes = total((_, k) => k == "spillSize"),
      observed = df.queryExecution.observedMetrics.toSeq.flatMap {
        case (name, row) =>
          row.schema.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
            if (row.isNullAt(i)) None
            else row.get(i) match {
              case l: Long  => Some(s"$name.${f.name}" -> l)
              case n: Int   => Some(s"$name.${f.name}" -> n.toLong)
              case s: Short => Some(s"$name.${f.name}" -> s.toLong)
              case b: Byte  => Some(s"$name.${f.name}" -> b.toLong)
              case _        => None
            }
          }
      }.toMap)
  }

  def render(s: Summary): String = {
    val header =
      f"files=${s.filesRead}%-6d bytesRead=${s.bytesRead}%-12d " +
        f"shuffleBytes=${s.shuffleBytesWritten}%-12d shuffleRecords=${s.shuffleRecordsWritten}%-10d " +
        f"spill=${s.spillBytes}"
    val lines = s.nodes.map { n =>
      val interesting = n.metrics.filter { case (k, v) =>
        v > 0 && (k.contains("rows") || k.contains("bytes") || k.contains("size") ||
          k == "numFiles" || k.contains("spill"))
      }
      f"  ${n.node}%-30s " + interesting.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
    }
    (header +: lines).mkString("\n")
  }
}
