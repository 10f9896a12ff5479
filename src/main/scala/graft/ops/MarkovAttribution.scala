package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain (removal-effect) multi-touch attribution — the
  * data-driven upgrade over positional rules (q185 last-touch, q252
  * U-shape): model journeys as a first-order chain over touchpoint
  * types, and credit each channel by how much total conversion
  * probability disappears when that channel is removed (its transitions
  * redirected to the null absorber) — Anderl et al. 2016's standard
  * formulation.
  *
  * Scale shape: journeys split per (user, journey) with ONE user-keyed
  * sort shared by the split and the adjacency lag (the q174/q184
  * machinery); transition counts leave the executors as a
  * (channels+2)²-bounded grid, and the absorbing-chain linear solves run
  * on the driver over that tiny matrix — channels are event types, never
  * data-sized. Everything up to the solve is exact keyed aggregation.
  */
object MarkovAttribution {

  val Start = "(start)"
  val Conv = "(conv)"
  val Null = "(null)"

  /** First-order transition counts over per-user journeys. A journey
    * starts at the user's first event (or after a conversion — the
    * conversion absorbs and the next touch starts fresh) and ends in
    * [[Conv]] on `convType` or [[Null]] at end-of-history. */
  def transitionCounts(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String, convType: String): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    // journey index = conversions strictly before this event
    val j = sum(when(col(typeCol) === convType, 1L).otherwise(0L))
      .over(byUser.rowsBetween(Window.unboundedPreceding, -1))
    val withJourney = events
      .withColumn("_j", coalesce(j, lit(0L)))
      .withColumn("_state",
        when(col(typeCol) === convType, Conv).otherwise(col(typeCol)))
    val byJourney = Window.partitionBy(col(userCol), col("_j"))
      .orderBy(col(tsCol), col(tieCol))
    withJourney
      .withColumn("_prev", lag(col("_state"), 1, Start).over(byJourney))
      .withColumn("_next", lead(col("_state"), 1).over(byJourney))
      .select(
        col("_prev").as("from_state"), col("_state").as("to_state"),
        // a non-absorbing journey tail also emits state -> (null)
        when(col("_next").isNull && col("_state") =!= Conv, Null).as("_tail"))
      .select(explode(filter(array(
        struct(col("from_state"), col("to_state")),
        struct(col("to_state").as("from_state"), col("_tail").as("to_state"))),
        s => s.getField("to_state").isNotNull)).as("t"))
      .select(col("t.from_state"), col("t.to_state"))
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
  }

  /** Absorption probability in [[Conv]] starting from [[Start]], for the
    * chain defined by `trans` (row-normalized counts), optionally with
    * one channel removed (its INCOMING transitions redirected to
    * [[Null]]). Gaussian elimination over the (channels+1) transient
    * states — driver-side, bounded by the type vocabulary. */
  private def convProbability(
      trans: Map[(String, String), Long], removed: Option[String]): Double = {
    // toSeq BEFORE remapping: redirecting (s, removedChannel) -> (s, Null)
    // can collide with an existing (s, Null) edge, and Map.map would
    // last-write-wins drop one of the counts before the groupBy-sum.
    val redirected = trans.toSeq.map { case ((a, b), n) =>
      (a, if (removed.contains(b)) Null else b) -> n
    }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      .filterNot { case ((a, _), _) => removed.contains(a) }
    val states = (redirected.keys.flatMap { case (a, b) => Seq(a, b) }.toSet -
      Conv - Null).toSeq.sorted
    if (!states.contains(Start)) return 0.0
    val idx = states.zipWithIndex.toMap
    val n = states.size
    val totals = redirected.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum.toDouble }
    // p = Qp + r  =>  (I - Q)p = r, r_s = P(s -> Conv)
    val a = Array.tabulate(n, n + 1) { (i, jj) =>
      val s = states(i)
      if (jj == n) redirected.getOrElse((s, Conv), 0L).toDouble / totals.getOrElse(s, 1.0)
      else {
        val t = states(jj)
        val q = redirected.getOrElse((s, t), 0L).toDouble / totals.getOrElse(s, 1.0)
        (if (i == jj) 1.0 else 0.0) - q
      }
    }
    // Gaussian elimination with partial pivoting over the tiny system
    for (c <- 0 until n) {
      val piv = (c until n).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(c); a(c) = a(piv); a(piv) = tmp
      if (math.abs(a(c)(c)) > 1e-12) {
        for (r <- 0 until n if r != c) {
          val f = a(r)(c) / a(c)(c)
          for (k <- c to n) a(r)(k) -= f * a(c)(k)
        }
      }
    }
    if (math.abs(a(idx(Start))(idx(Start))) < 1e-12) 0.0
    else a(idx(Start))(n) / a(idx(Start))(idx(Start))
  }

  /** Removal effect + normalized credit share per channel.
    *
    * Driver-memory envelope: the transition grid collected here is at
    * most `states²` rows (two short strings + a long each, ≤ ~2 MB at
    * the default cap of 256), and the removal-effect pass runs
    * `channels + 1` Gaussian solves at O(states³) — ~4×10⁹ flops at the
    * cap, seconds on the driver. Channel attribution's states are event
    * TYPES, so real inputs sit far below the cap; a data-sized state
    * column (user ids, URLs) would make the collect and the solves
    * data-proportional, so the operator refuses it loudly instead of
    * degrading — pass a larger `maxStates` only for a genuinely bounded
    * vocabulary. (Same envelope-documentation pattern as
    * [[SetSimJoin]]'s Θ(n²·p) note.) */
  def attribute(spark: SparkSession, trans: DataFrame, maxStates: Int = 256): DataFrame = {
    import spark.implicits._
    val nStates = trans.select(col("from_state").as("s"))
      .union(trans.select(col("to_state").as("s"))).distinct().count()
    require(nStates <= maxStates,
      s"MarkovAttribution.attribute: $nStates distinct states exceeds maxStates=$maxStates " +
        "— the transition matrix (states² counts) is collected to the driver and solved " +
        "per-channel at O(states³); states must be a bounded channel vocabulary, not a " +
        "data-sized key. Raise maxStates only if the vocabulary is genuinely bounded.")
    val t = trans.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val base = convProbability(t, None)
    val channels = t.keys.flatMap { case (a, b) => Seq(a, b) }
      .filterNot(Set(Start, Conv, Null)).toSeq.distinct.sorted
    val effects = channels.map { c =>
      val re =
        if (base <= 0.0) 0.0
        else math.max(0.0, 1.0 - convProbability(t, Some(c)) / base)
      (c, re)
    }
    val totalRe = effects.map(_._2).sum
    effects.map { case (c, re) =>
      (c, re, if (totalRe > 0) re / totalRe else 0.0)
    }.toDF("channel", "removal_effect", "share")
  }
}
