package graft

import org.apache.spark.sql.functions._

/** Targeted checks for q281 (time-to-convert percentiles) and q282
  * (nearest-centroid confusion): both recomputed end-to-end on the
  * driver in plain Scala — interpolated percentiles from sorted
  * latencies, and centroids/classification from the raw float arrays.
  */
class ConvertCentroidSpec extends SparkSuite {

  private def r6d(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q281: percentiles match a driver-side interpolated recomputation") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstView = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, xs) => (u, xs.map(_._3).min) }
    val lats = firstView.toSeq.flatMap { case (u, v) =>
      val ps = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= v)
      if (ps.isEmpty) None else Some((ps.map(_._3).min - v).toDouble)
    }.sorted
    def interp(q: Double): Double = {
      val p = (lats.length - 1) * q
      val lo = p.toInt
      val hi = math.min(lo + 1, lats.length - 1)
      lats(lo) + (lats(hi) - lats(lo)) * (p - lo)
    }
    val row = SparkEntry.queries("q281_time_to_convert")(spark, sf0001).collect()(0)
    assert(row.getAs[Long]("n_converted") == lats.length)
    assert(math.abs(row.getAs[Double]("p50_s") - r6d(interp(0.5) / 1e6)) < 1e-9)
    assert(math.abs(row.getAs[Double]("p90_s") - r6d(interp(0.9) / 1e6)) < 1e-9)
    assert(math.abs(row.getAs[Double]("p99_s") - r6d(interp(0.99) / 1e6)) < 1e-9)
  }

  test("q282: confusion matrix matches a from-scratch Scala classification") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .collect().map(r => (r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    val centroids = vecs.groupBy(_._1).map { case (l, xs) =>
      val dim = xs.head._2.length
      l -> Array.tabulate(dim)(i => r6d(xs.map(_._2(i)).sum / xs.length))
    }
    val expected = vecs.map { case (label, emb) =>
      val pred = centroids.toSeq.map { case (cl, c) =>
        val dist = emb.indices.foldLeft(0.0)((acc, i) =>
          acc + (emb(i) - c(i)) * (emb(i) - c(i)))
        (dist, cl)
      }.min._2
      (label, pred)
    }.groupBy(identity).map { case (k, xs) => (k, xs.length.toLong) }
    val got = SparkEntry.queries("q282_centroid_confusion")(spark, sf0001)
      .collect().map(r => ((r.getAs[Int]("label"), r.getAs[Int]("pred")),
        r.getAs[Long]("n"))).toMap
    assert(got == expected)
    assert(got.values.sum == vecs.length.toLong)
  }
}
