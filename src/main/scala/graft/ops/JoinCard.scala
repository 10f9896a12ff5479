package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-cardinality estimation WITHOUT executing the join — the planning
  * primitive behind "will this equi-join explode?". One aggregation job
  * per side collects a key summary (row count, approximate distinct key
  * count, Misra-Gries heavy hitters); the estimate combines them with the
  * classic end-biased-histogram model (Ioannidis & Christodoulakis,
  * SIGMOD'91 — the same shape System R's `n_A·n_B / max(d_A, d_B)` is the
  * degenerate no-histogram case of):
  *
  *   - heavy keys present on BOTH sides contribute their exact product
  *     `c_A(k) · c_B(k)` — the term that catches the skew blow-up a
  *     uniform model misses by orders of magnitude;
  *   - a heavy key of one side matched against the other side's tail
  *     contributes `c(k) ·` (the tail's average multiplicity);
  *   - tail × tail falls back to the uniform-independence model
  *     `t_A · t_B / max(d_A', d_B')`.
  *
  * Costs: two single-pass aggregations with O(k) state per partition
  * ([[HeavyHitters.MisraGriesAgg]] + `approx_count_distinct`), two
  * driver-side rows. Nothing about the estimate touches the data again —
  * at 100 TB this is what lets a pipeline refuse a join that would
  * produce 10¹⁴ rows BEFORE paying for the shuffle. MG counts are lower
  * bounds (within n/(k+1)), so heavy-heavy products under- rather than
  * over-estimate; the tail terms absorb the remainder.
  */
object JoinCard {

  /** One side's key summary. `heavy` maps the `\u0001`-joined key tuple to
    * its Misra-Gries count estimate. */
  final case class KeySummary(rows: Long, distinct: Long, heavy: Map[String, Long], k: Int) {
    /** Rows NOT attributed to heavy keys (>= 0; MG under-counts). */
    def tailRows: Long = math.max(0L, rows - heavy.values.sum)
    /** Distinct keys outside the heavy set (at least 1 to keep the
      * uniform model defined; approx-distinct noise can dip below). */
    def tailDistinct: Long = math.max(1L, distinct - heavy.size)
    /** Average multiplicity of a tail key. */
    def tailAvg: Double = if (tailRows == 0) 0.0 else tailRows.toDouble / tailDistinct
  }

  /** ONE aggregation job: row count + approx distinct keys + top-k heavy
    * hitters over the (possibly composite) join-key tuple. */
  def summarize(df: DataFrame, keys: Seq[String], k: Int = 64): KeySummary = {
    require(keys.nonEmpty, "at least one join key required")
    val tuple = concat_ws("\u0001", keys.map(c => col(c).cast("string")): _*)
    val mg = udaf(new HeavyHitters.MisraGriesAgg(k))
    val row = df.select(tuple.as("k"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("k")).as("d"),
        mg(col("k")).as("mg"))
      .head()
    KeySummary(row.getLong(0), row.getLong(1), row.getAs[Map[String, Long]]("mg"), k)
  }

  /** Estimated |A ⋈ B| on the summarized key. */
  def estimate(a: KeySummary, b: KeySummary): Double = {
    if (a.rows == 0 || b.rows == 0) return 0.0
    val shared = a.heavy.keySet.intersect(b.heavy.keySet)
    val heavyHeavy = shared.iterator
      .map(k => a.heavy(k).toDouble * b.heavy(k).toDouble).sum
    // a heavy key of one side, absent from the other's heavy set, is
    // modeled as one average tail key of that other side — the standard
    // end-biased assumption that key domains overlap (a containment
    // assumption; disjoint domains over-estimate, as every uniform model
    // does).
    val heavyATail = a.heavy.iterator
      .filterNot { case (k, _) => shared(k) }
      .map(_._2.toDouble * b.tailAvg).sum
    val heavyBTail = b.heavy.iterator
      .filterNot { case (k, _) => shared(k) }
      .map(_._2.toDouble * a.tailAvg).sum
    val tailTail =
      if (a.tailRows == 0 || b.tailRows == 0) 0.0
      else a.tailRows.toDouble * b.tailRows.toDouble /
        math.max(a.tailDistinct, b.tailDistinct).toDouble
    heavyHeavy + heavyATail + heavyBTail + tailTail
  }

  /** Convenience: summarize both sides and estimate in one call.
    * Returns (estimate, left summary, right summary) so callers can log
    * or persist the summaries (they are reusable across joins on the
    * same key). */
  def estimateJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      k: Int = 64): (Double, KeySummary, KeySummary) = {
    val ls = summarize(left, keys, k)
    val rs = summarize(right, keys, k)
    (estimate(ls, rs), ls, rs)
  }

  /** Explosion guard: refuse an equi-join whose estimated output exceeds
    * `maxRows` BEFORE any shuffle is paid — two stats passes instead of a
    * cluster-melting join. Returns the joined frame (un-executed) plus the
    * estimate when within bounds; throws with both sides' hot keys named
    * when not, so the error message already contains the skew diagnosis
    * (the key to salt, filter, or pre-aggregate). */
  def guardedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      maxRows: Double, k: Int = 64): (DataFrame, Double) = {
    val (est, ls, rs) = estimateJoin(left, right, keys, k)
    if (est > maxRows) {
      def hot(s: KeySummary) = s.heavy.maxByOption(_._2)
        .map { case (key, c) => s"'$key' (~$c rows)" }.getOrElse("none")
      throw new IllegalStateException(
        f"join on ${keys.mkString(",")} estimated at $est%.3g rows > bound $maxRows%.3g; " +
          s"left: ${ls.rows} rows, hot key ${hot(ls)}; " +
          s"right: ${rs.rows} rows, hot key ${hot(rs)}")
    }
    (left.join(right, keys), est)
  }
}
