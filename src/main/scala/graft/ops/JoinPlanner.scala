package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Stats-driven join strategy selection — the planning layer a 100 TB
  * star join actually needs, decided from MEASURED inputs rather than
  * hand-placed hints:
  *
  *  - a side small enough to replicate → `broadcast()` (no shuffle at
  *    all on the big side);
  *  - a provably hot key on the big side against a replicable dimension
  *    → planned salting ([[Salt.saltedJoin]]) — the case AQE's runtime
  *    skew split cannot always save, because one reducer's partial state
  *    for a single key can already be fatal before AQE sees sizes;
  *  - otherwise a plain keyed shuffle join, leaving residual runtime
  *    skew to AQE (AqeSkewSpec pins that path).
  *
  * The stats come from ONE aggregation job per side: total row count plus
  * a Misra-Gries top-key summary ([[HeavyHitters.MisraGriesAgg]] — O(k)
  * state per partition, never a groupBy over the key space). MG counts
  * under-estimate by at most n/(k+1), so with summary size k ≥ ~4/t every
  * key with true frequency ≥ t·n is detected (and nothing below
  * t·n − 2n/(k+1) false-positives). At 100 TB these stats are the stored
  * [[TableStats]] kind — `autoJoin` accepts pre-collected stats and only
  * measures when not given any.
  *
  * The decision layer never changes semantics: every branch returns
  * exactly the rows of `left.join(right, key)` (spec-asserted per branch,
  * and oracle-checked end-to-end as q121).
  */
object JoinPlanner {

  /** Measured join-side statistics. `topKeyRows` is the MG estimate
    * (lower bound within n/(k+1)) for `topKey`. */
  final case class SideStats(rows: Long, topKey: Option[String], topKeyRows: Long, k: Int) {
    /** Conservative skew test: true when the hot key's LOWER-bound
      * frequency plus the MG error bound crosses `fraction` of the side —
      * i.e. the key may truly hold ≥ fraction of all rows. */
    def maybeSkewed(fraction: Double): Boolean =
      rows > 0 && (topKeyRows + rows / (k + 1)).toDouble / rows >= fraction
  }

  final case class Decision(strategy: String, reason: String)

  /** One-job stats: COUNT(*) + Misra-Gries summary over the key. */
  def gatherStats(df: DataFrame, key: String, k: Int = 32): SideStats = {
    val mg = udaf(new HeavyHitters.MisraGriesAgg(k))
    val row: Row = df.select(col(key).cast("string").as("k"))
      .agg(count(lit(1)).as("n"), mg(col("k")).as("mg"))
      .head()
    val n = row.getLong(0)
    val summary = row.getAs[Map[String, Long]]("mg")
    val top = if (summary.isEmpty) None else Some(summary.maxBy(_._2))
    SideStats(n, top.map(_._1), top.map(_._2).getOrElse(0L), k)
  }

  /** Equi-join `left ⋈ right` on `key` with a measured strategy choice.
    * Thresholds are in ROWS (the unit the stats measure; translate from
    * bytes with your row width): `broadcastMaxRows` caps the replicated
    * side, `replicateMaxRows` caps the dimension side a salted join may
    * replicate `saltBuckets`-fold. Returns the joined frame and the
    * decision (for logging/plan tests). */
  def autoJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      broadcastMaxRows: Long = 1000000L,
      skewFraction: Double = 0.2,
      saltBuckets: Int = 16,
      replicateMaxRows: Long = 10000000L,
      leftStats: Option[SideStats] = None,
      rightStats: Option[SideStats] = None): (DataFrame, Decision) = {
    val ls = leftStats.getOrElse(gatherStats(left, key))
    val rs = rightStats.getOrElse(gatherStats(right, key))
    if (rs.rows <= broadcastMaxRows)
      (left.join(broadcast(right), Seq(key)),
        Decision("broadcast-right", s"right has ${rs.rows} rows <= $broadcastMaxRows"))
    else if (ls.rows <= broadcastMaxRows)
      (broadcast(left).join(right, Seq(key)),
        Decision("broadcast-left", s"left has ${ls.rows} rows <= $broadcastMaxRows"))
    else if (ls.maybeSkewed(skewFraction) && rs.rows <= replicateMaxRows)
      (Salt.saltedJoin(left, right, key, saltBuckets),
        Decision("salted",
          s"left key '${ls.topKey.getOrElse("?")}' holds >= ~${ls.topKeyRows} of ${ls.rows} rows; " +
            s"right (${rs.rows} rows) replicated x$saltBuckets"))
    else
      (left.join(right, Seq(key)),
        Decision("shuffle", s"no replicable side (${ls.rows} x ${rs.rows} rows); AQE owns residual skew"))
  }

  /** The aggregation twin of [[autoJoin]]: sum+count per key, with the
    * two-phase salted form ([[Salt.saltedSumCount]]) chosen only when the
    * measured stats say a single key may hold ≥ `skewFraction` of the
    * input — the case where one reducer's partial state is fatal before
    * AQE can see sizes. A uniform key distribution keeps the plain
    * one-shuffle aggregate (map-side partial combine already balances
    * it). Results are identical either way — salting is decomposable-
    * aggregate algebra, and q79's oracle pins it. Output columns:
    * (key, sum_<valueCol>, cnt). */
  def autoSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      skewFraction: Double = 0.2,
      saltBuckets: Int = 16,
      stats: Option[SideStats] = None): (DataFrame, Decision) = {
    val s = stats.getOrElse(gatherStats(df, key))
    if (s.maybeSkewed(skewFraction))
      (Salt.saltedSumCount(df, key, valueCol, saltBuckets),
        Decision("salted-agg",
          s"key '${s.topKey.getOrElse("?")}' holds >= ~${s.topKeyRows} of ${s.rows} rows"))
    else
      (df.groupBy(org.apache.spark.sql.functions.col(key))
        .agg(
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col(valueCol))
            .as(s"sum_$valueCol"),
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("cnt")),
        Decision("plain-agg", s"no key holds >= $skewFraction of ${s.rows} rows"))
  }
}
