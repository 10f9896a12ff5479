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
  * Join keys may be COMPOSITE (`Seq[String]`) — the stats job summarizes
  * the tuple (a `\u0001`-joined string key: one Misra-Gries pass whatever
  * the arity), salting spreads the hot tuple, and every branch joins on
  * the full key list. Real star schemas hit this constantly
  * (fact ⋈ dim on (part, supp), (date, store), ...).
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
  * exactly the rows of `left.join(right, keys)` (spec-asserted per branch
  * on scalar AND composite keys, and oracle-checked end-to-end as
  * q121/q129).
  */
object JoinPlanner {

  /** Measured join-side statistics. `topKeyRows` is the MG estimate
    * (lower bound within n/(k+1)) for `topKey` (composite keys are
    * reported as their `\u0001`-joined form). */
  final case class SideStats(rows: Long, topKey: Option[String], topKeyRows: Long, k: Int) {
    /** Conservative skew test: true when the hot key's LOWER-bound
      * frequency plus the MG error bound crosses `fraction` of the side —
      * i.e. the key may truly hold ≥ fraction of all rows. Stats with NO
      * key summary (e.g. [[JoinPlanner.manifestStats]]) never claim skew:
      * salting needs a measured pass, and "unknown" must not trigger it. */
    def maybeSkewed(fraction: Double): Boolean =
      topKey.nonEmpty && rows > 0 &&
        (topKeyRows + rows / (k + 1)).toDouble / rows >= fraction
  }

  final case class Decision(strategy: String, reason: String)

  /** The composite-key summary column: a `\u0001`-joined string of the key
    * tuple. `concat_ws` skips NULL fields, so (1, NULL) and (1, "") fold
    * together — acceptable for STATS (a frequency estimate), never used
    * for the join itself. */
  private def tupleKey(keys: Seq[String]) =
    concat_ws("\u0001", keys.map(k => col(k).cast("string")): _*)

  /** One-job stats: COUNT(*) + Misra-Gries summary over the key tuple. */
  def gatherStats(df: DataFrame, keys: Seq[String], k: Int = 32): SideStats = {
    require(keys.nonEmpty, "at least one join key required")
    val mg = udaf(new HeavyHitters.MisraGriesAgg(k))
    val row: Row = df.select(tupleKey(keys).as("k"))
      .agg(count(lit(1)).as("n"), mg(col("k")).as("mg"))
      .head()
    val n = row.getLong(0)
    val summary = row.getAs[Map[String, Long]]("mg")
    val top = if (summary.isEmpty) None else Some(summary.maxBy(_._2))
    SideStats(n, top.map(_._1), top.map(_._2).getOrElse(0L), k)
  }

  def gatherStats(df: DataFrame, key: String): SideStats = gatherStats(df, Seq(key))

  /** Equi-join `left ⋈ right` on `keys` with a measured strategy choice.
    * Thresholds are in ROWS (the unit the stats measure; translate from
    * bytes with your row width): `broadcastMaxRows` caps the replicated
    * side, `replicateMaxRows` caps the dimension side a salted join may
    * replicate `saltBuckets`-fold. Returns the joined frame and the
    * decision (for logging/plan tests). */
  def autoJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      broadcastMaxRows: Long = 1000000L,
      skewFraction: Double = 0.2,
      saltBuckets: Int = 16,
      replicateMaxRows: Long = 10000000L,
      leftStats: Option[SideStats] = None,
      rightStats: Option[SideStats] = None): (DataFrame, Decision) = {
    val ls = leftStats.getOrElse(gatherStats(left, keys))
    val rs = rightStats.getOrElse(gatherStats(right, keys))
    if (rs.rows <= broadcastMaxRows)
      (left.join(broadcast(right), keys),
        Decision("broadcast-right", s"right has ${rs.rows} rows <= $broadcastMaxRows"))
    else if (ls.rows <= broadcastMaxRows)
      (broadcast(left).join(right, keys),
        Decision("broadcast-left", s"left has ${ls.rows} rows <= $broadcastMaxRows"))
    else if (ls.maybeSkewed(skewFraction) && rs.rows <= replicateMaxRows)
      (Salt.saltedJoin(left, right, keys, saltBuckets),
        Decision("salted",
          s"left key '${ls.topKey.getOrElse("?")}' holds >= ~${ls.topKeyRows} of ${ls.rows} rows; " +
            s"right (${rs.rows} rows) replicated x$saltBuckets"))
    else
      (left.join(right, keys),
        Decision("shuffle", s"no replicable side (${ls.rows} x ${rs.rows} rows); AQE owns residual skew"))
  }

  def autoJoin(left: DataFrame, right: DataFrame, key: String): (DataFrame, Decision) =
    autoJoin(left, right, Seq(key))

  /** ZERO-SCAN stats from a versioned table's manifest
    * ([[graft.io.VersionedTable.countRows]] sums the per-file row counts
    * every commit records — one manifest read, no data-file opens). The
    * manifest stores no key-frequency summary, so `topKey` is empty and
    * `maybeSkewed` stays conservatively false: manifest stats drive the
    * BROADCAST decision (the one that matters most and needs only a row
    * count) for free, while skew-salting still requires a measured
    * [[gatherStats]] pass. At 100 TB this is the difference between "the
    * planner read one small JSON" and "the planner scanned the fact". */
  def manifestStats(
      spark: org.apache.spark.sql.SparkSession, path: String,
      version: Option[Long] = None): SideStats =
    SideStats(
      graft.io.VersionedTable.countRows(spark, path, version),
      topKey = None, topKeyRows = 0L, k = 32)

  /** Fact-side stats for SEVERAL key sets in ONE scan: count(*) plus one
    * Misra-Gries summary per key set, all riding a single aggregation —
    * the way a star join measures its fact once instead of once per
    * dimension (at 100 TB, N fact scans for stats is the difference
    * between planning being free and being the job). */
  def gatherStatsMulti(df: DataFrame, keySets: Seq[Seq[String]], k: Int = 32): Seq[SideStats] = {
    require(keySets.nonEmpty && keySets.forall(_.nonEmpty), "key sets must be non-empty")
    val mg = udaf(new HeavyHitters.MisraGriesAgg(k))
    val keyed = df.select(keySets.zipWithIndex.map { case (ks, i) => tupleKey(ks).as(s"k$i") }: _*)
    val aggs = count(lit(1)).as("n") +:
      keySets.indices.map(i => mg(col(s"k$i")).as(s"mg$i"))
    val row: Row = keyed.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    keySets.indices.map { i =>
      val summary = row.getAs[Map[String, Long]](s"mg$i")
      val top = if (summary.isEmpty) None else Some(summary.maxBy(_._2))
      SideStats(n, top.map(_._1), top.map(_._2).getOrElse(0L), k)
    }
  }

  /** Star join: `fact ⋈ dim_1 ⋈ ... ⋈ dim_n`, each dimension on its own
    * (possibly composite) key set sharing the fact's column names, with a
    * measured per-dimension strategy AND a measured join ORDER:
    *
    *  1. every replicable dimension broadcasts FIRST — those joins add
    *     zero exchanges, so the fact flows through them un-shuffled
    *     however many there are (the common star: one big fact, many
    *     small dims, no shuffle at all);
    *  2. remaining big dimensions join in ASCENDING row-count order —
    *     each one forces a fact shuffle on its key, and an inner join
    *     can only shrink the fact, so the cheapest reducers run while
    *     the fact is largest and the most expensive see the most-reduced
    *     fact;
    *  3. a dimension whose fact-side key is measurably skewed (and which
    *     is itself replicable `saltBuckets`-fold) takes the planned
    *     salted form, exactly as [[autoJoin]].
    *
    * Fact stats for ALL key sets come from one scan
    * ([[gatherStatsMulti]]); each dimension costs one count. Fact-side
    * skew stats are measured on the ORIGINAL fact — inner joins only
    * shrink a key's count, so a stale estimate errs toward salting: the
    * semantics-preserving direction. Every branch returns exactly the
    * rows of the equivalent chained inner join (spec row-compared;
    * q150 oracle-checks end-to-end). */
  def autoStarJoin(
      fact: DataFrame,
      dims: Seq[(DataFrame, Seq[String])],
      broadcastMaxRows: Long = 1000000L,
      skewFraction: Double = 0.2,
      saltBuckets: Int = 16,
      replicateMaxRows: Long = 10000000L): (DataFrame, Seq[Decision]) = {
    require(dims.nonEmpty, "at least one dimension required")
    val factStats = gatherStatsMulti(fact, dims.map(_._2))
    val annotated = dims.zipWithIndex.map { case ((dim, keys), i) =>
      (dim, keys, dim.count(), factStats(i))
    }
    val (small, big) = annotated.partition(_._3 <= broadcastMaxRows)
    var acc = fact
    val decisions = Seq.newBuilder[Decision]
    small.foreach { case (dim, keys, n, _) =>
      acc = acc.join(broadcast(dim), keys)
      decisions += Decision("broadcast",
        s"dim(${keys.mkString(",")}) has $n rows <= $broadcastMaxRows; joined pre-shuffle")
    }
    big.sortBy(_._3).foreach { case (dim, keys, n, fs) =>
      if (fs.maybeSkewed(skewFraction) && n <= replicateMaxRows) {
        acc = Salt.saltedJoin(acc, dim, keys, saltBuckets)
        decisions += Decision("salted",
          s"fact key '${fs.topKey.getOrElse("?")}' holds >= ~${fs.topKeyRows} of ${fs.rows} rows; " +
            s"dim(${keys.mkString(",")}) ($n rows) replicated x$saltBuckets")
      } else {
        acc = acc.join(dim, keys)
        decisions += Decision("shuffle",
          s"dim(${keys.mkString(",")}) has $n rows; joined in ascending-size order")
      }
    }
    (acc, decisions.result())
  }

  /** The aggregation twin of [[autoJoin]]: sum+count per key tuple, with
    * the two-phase salted form ([[Salt.saltedSumCount]]) chosen only when
    * the measured stats say a single key tuple may hold ≥ `skewFraction`
    * of the input — the case where one reducer's partial state is fatal
    * before AQE can see sizes. A uniform key distribution keeps the plain
    * one-shuffle aggregate (map-side partial combine already balances
    * it). Results are identical either way — salting is decomposable-
    * aggregate algebra, and q79's oracle pins it. Output columns:
    * (keys..., sum_<valueCol>, cnt). */
  def autoSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      skewFraction: Double = 0.2,
      saltBuckets: Int = 16,
      stats: Option[SideStats] = None): (DataFrame, Decision) = {
    val s = stats.getOrElse(gatherStats(df, keys))
    if (s.maybeSkewed(skewFraction))
      (Salt.saltedSumCount(df, keys, valueCol, saltBuckets),
        Decision("salted-agg",
          s"key '${s.topKey.getOrElse("?")}' holds >= ~${s.topKeyRows} of ${s.rows} rows"))
    else
      (df.groupBy(keys.map(col): _*)
        .agg(sum(col(valueCol)).as(s"sum_$valueCol"), count(lit(1)).as("cnt")),
        Decision("plain-agg", s"no key holds >= $skewFraction of ${s.rows} rows"))
  }

  def autoSumCount(df: DataFrame, key: String, valueCol: String): (DataFrame, Decision) =
    autoSumCount(df, Seq(key), valueCol)
}
