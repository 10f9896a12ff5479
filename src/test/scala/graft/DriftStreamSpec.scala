package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{DriftStat, ValueEvent}

/** Streaming drift monitor ([[EventStreams.streamingDrift]]): the
  * stream-final KS per type equals a direct batch recomputation over the
  * same events, state grows with BINS not events, and an in-distribution
  * stream scores lower than a shifted one.
  */
class DriftStreamSpec extends SparkSuite {
  import spark.implicits._

  private val W = 10.0

  private def ksOf(
      ref: Map[Long, Long], live: Map[Long, Long]): (Long, Double) = {
    val nRef = ref.values.sum; val nLive = live.values.sum
    var (sR, sL, best) = (0L, 0L, 0L)
    (ref.keySet ++ live.keySet).toSeq.sorted.foreach { b =>
      sR += ref.getOrElse(b, 0L); sL += live.getOrElse(b, 0L)
      best = math.max(best, math.abs(sR * nLive - sL * nRef))
    }
    (best, if (nRef == 0 || nLive == 0) 0.0 else best.toDouble / (nRef.toDouble * nLive))
  }

  private def binned(vs: Seq[Double]): Map[Long, Long] =
    vs.groupBy(v => math.floor(v / W).toLong).map { case (b, xs) => b -> xs.length.toLong }

  private def run(
      reference: Map[String, Map[Long, Long]],
      batches: Seq[Seq[ValueEvent]]): Map[String, (Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val name = s"drift_t_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ms = MemoryStream[ValueEvent]
    val q = EventStreams.streamingDrift(spark, ms.toDS(), reference, W)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // the final (max n_live) emission per type is the end state
      spark.table(name)
        .groupBy("event_type")
        .agg(max(struct(col("n_live"), col("ks_scaled"), col("ks"))).as("m"))
        .select("event_type", "m.n_live", "m.ks_scaled", "m.ks")
        .as[(String, Long, Long, Double)].collect()
        .map { case (t, n, s, k) => t -> ((n, s, k)) }.toMap
    } finally q.stop()
  }

  test("stream-final KS equals the batch recomputation across micro-batches") {
    val refVals = Map(
      "click" -> Seq(1.0, 12.0, 23.0, 34.0, 45.0, 18.0),
      "view" -> Seq(5.0, 5.5, 6.0, 95.0))
    val reference = refVals.map { case (t, vs) => t -> binned(vs) }
    val b1 = Seq(ValueEvent("click", 2.0), ValueEvent("click", 99.0), ValueEvent("view", 7.0))
    val b2 = Seq(ValueEvent("click", 15.0), ValueEvent("view", 91.0), ValueEvent("view", 50.0))
    val got = run(reference, Seq(b1, b2))
    val liveByType = (b1 ++ b2).groupBy(_.event_type)
    liveByType.foreach { case (t, evs) =>
      val (scaled, ks) = ksOf(reference(t), binned(evs.map(_.value)))
      assert(got(t)._1 == evs.length.toLong)
      assert(got(t)._2 == scaled, s"$t ks_scaled")
      assert(math.abs(got(t)._3 - ks) < 1e-12, s"$t ks")
    }
  }

  test("reference from a batch frame + shifted live stream scores higher than in-distribution") {
    val refDf = graft.core.Tables.events(spark, sf0001).select("event_type", "value")
    val reference = EventStreams.referenceBins(refDf, "event_type", "value", W)
    val inDist = refDf.limit(200).as[(String, Double)].collect()
      .map { case (t, v) => ValueEvent(t, v) }.toSeq
    val shifted = inDist.map(e => e.copy(value = e.value + 200.0))
    val gotIn = run(reference, Seq(inDist))
    val gotShift = run(reference, Seq(shifted))
    gotShift.keySet.intersect(gotIn.keySet).foreach { t =>
      assert(gotShift(t)._3 > gotIn(t)._3, s"shifted $t should drift more")
    }
  }

  test("emitted stats after every micro-batch reflect cumulative state") {
    val reference = Map("a" -> Map(0L -> 2L, 1L -> 2L))
    val got1 = run(reference, Seq(Seq(ValueEvent("a", 1.0))))
    assert(got1("a")._1 == 1L)
    val got2 = run(reference, Seq(Seq(ValueEvent("a", 1.0)), Seq(ValueEvent("a", 15.0))))
    assert(got2("a")._1 == 2L)
  }
}
