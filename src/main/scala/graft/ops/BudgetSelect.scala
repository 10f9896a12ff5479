package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Windows

/** Token-budget corpus selection — "take the highest-quality documents
  * until the token budget is spent", the selection step of every
  * data-constrained pretraining recipe (quality-filter papers phrase it
  * as: rank by quality, keep the top X% of token mass).
  *
  * Semantics (exact, totally ordered): documents sorted by
  * (quality DESC, id ASC); a document is selected iff the running token
  * total through it (inclusive) stays within the budget. The budget is
  * `num/den` of the corpus's total tokens, computed in integer arithmetic
  * so the cut point is identical on any engine.
  *
  * The naive form is one global window over the corpus — exactly the
  * unpartitioned-window scale bug this engine bans (PlanShapeSpec). The
  * scale-safe shape is two-level THRESHOLD REFINEMENT, the same
  * histogram-then-refine pattern as [[GlobalRank]]:
  *
  *   1. quality-cell histogram: one `groupBy(quality)` aggregate — the
  *      quality column is required to be integral (a quantized grid), so
  *      the histogram is grid-bounded, and its cumulative window is
  *      legitimately single-task ([[Windows.bounded]]). Cells wholly
  *      inside the budget are selected by a FILTER, not a window.
  *   2. within the one boundary cell: the same trick again over id
  *      buckets (`id div 4096`), leaving only the boundary BUCKET —
  *      ≤ 4096 ids — to order exactly with a partitioned window.
  *
  * Driver traffic: three single-row boundary lookups (the classic
  * bounded-metadata collects, like [[JoinPlanner]]'s stats). Everything
  * data-sized stays declarative and keyed. */
object BudgetSelect {

  private val BucketWidth = 4096L

  /** Rows of `df` selected under the budget, original columns preserved.
    *
    * @param qgridCol integral quality grid (higher = better); quantize
    *                 continuous scores BEFORE calling (the grid defines
    *                 the selection semantics and bounds the histogram)
    * @param tokCol   integral token count per row
    * @param idCol    unique integral id — the deterministic tie-break
    * @param num,den  budget = floor(total_tokens * num / den)
    */
  def selectByBudget(
      df: DataFrame, qgridCol: Column, tokCol: Column, idCol: String,
      num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0, "budget fraction must be non-negative")
    val base = df
      .withColumn("_q", qgridCol.cast("long"))
      .withColumn("_tok", tokCol.cast("long"))
      .withColumn("_id", col(idCol).cast("long"))
    val totalRow = base.agg(coalesce(sum(col("_tok")), lit(0L))).head()
    val budget = (BigInt(totalRow.getLong(0)) * num / den).toLong

    val h1 = base.groupBy(col("_q")).agg(sum(col("_tok")).as("ct"))
    val cum1 = h1.withColumn("cum", sum(col("ct")).over(Windows.bounded(col("_q").desc)))
    // first cell (in quality-descending order) that overflows the budget
    val boundary1 = cum1.filter(col("cum") > budget)
      .orderBy(col("_q").desc).limit(1).collect().headOption

    boundary1 match {
      case None => df // whole corpus fits
      case Some(b1) =>
        val tq = b1.getLong(0)
        val rem = budget - (b1.getLong(2) - b1.getLong(1)) // budget - cumBefore
        val fullCells = base.filter(col("_q") > tq)

        val cellDocs = base.filter(col("_q") === tq)
        val h2 = cellDocs
          .groupBy((col("_id") - pmod(col("_id"), lit(BucketWidth))).as("_b"))
          .agg(sum(col("_tok")).as("bt"))
        val cum2 = h2.withColumn("cum", sum(col("bt")).over(Windows.bounded(col("_b"))))
        val boundary2 = cum2.filter(col("cum") > rem)
          .orderBy(col("_b")).limit(1).collect().headOption

        val selected = boundary2 match {
          case None => fullCells.unionByName(cellDocs) // cell fits after all
          case Some(b2) =>
            val tb = b2.getLong(0)
            val rem2 = rem - (b2.getLong(2) - b2.getLong(1))
            val fullBuckets = cellDocs.filter(col("_id") - pmod(col("_id"), lit(BucketWidth)) < tb)
            // the one boundary bucket: ≤ BucketWidth ids, partitioned window
            val bw = Window
              .partitionBy((col("_id") - pmod(col("_id"), lit(BucketWidth))))
              .orderBy(col("_id"))
            val boundaryDocs = cellDocs
              .filter(col("_id") - pmod(col("_id"), lit(BucketWidth)) === tb)
              .withColumn("_c", sum(col("_tok")).over(bw))
              .filter(col("_c") <= rem2)
              .drop("_c")
            fullCells.unionByName(fullBuckets).unionByName(boundaryDocs)
        }
        selected.drop("_q", "_tok", "_id")
    }
  }
}
