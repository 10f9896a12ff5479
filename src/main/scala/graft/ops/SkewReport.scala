package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-key skew profile — the DIAGNOSIS in front of [[Salt]] and
  * [[JoinPlanner]]'s decisions: before keying a 100 TB shuffle on a
  * column, know how hot its heaviest key is. Per profiled column: row
  * and distinct-key counts, the heaviest key with its share, the top-k
  * share, and max/mean — the number that says how many straggler tasks a
  * plain hash partitioning would produce (a skew ratio of 50 means the
  * hottest partition does 50× the average's work).
  *
  * One keyed aggregation per column plus constant-size follow-ups (the
  * top-k and totals are key-count-sized aggregates of the count table,
  * never data-sized). Heaviest-key tie-break is (count, key) max — the
  * same deterministic rule the oracle replays. */
object SkewReport {

  def profile(df: DataFrame, cols: Seq[String], topK: Int = 5): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.map { c =>
      val counts = df.groupBy(col(c).cast("string").as("k"))
        .agg(count(lit(1)).as("n"))
      val tot = counts.agg(
        sum("n").as("n_rows"), count(lit(1)).as("n_keys"),
        max(struct(col("n"), col("k"))).as("h"))
      val top = counts.orderBy(col("n").desc, col("k")).limit(topK)
        .agg(sum("n").as("top_n"))
      tot.crossJoin(top).select(
        lit(c).as("key_col"),
        col("n_rows"), col("n_keys"),
        col("h.k").as("heavy_key"),
        round(col("h.n") / col("n_rows"), 6).as("heavy_share"),
        round(col("top_n") / col("n_rows"), 6).as("topk_share"),
        round(col("h.n") * col("n_keys") / col("n_rows"), 4).as("skew_ratio"))
    }.reduce(_.unionByName(_))
  }
}
