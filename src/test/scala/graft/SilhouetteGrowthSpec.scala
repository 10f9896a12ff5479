package graft

import org.apache.spark.sql.functions._

/** Targeted checks for q289 (simplified silhouette) and q290 (revenue
  * growth accounting): silhouette recomputed from scratch on the driver;
  * the growth bridge pinned to its accounting identity. */
class SilhouetteGrowthSpec extends SparkSuite {

  private def r6d(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q289: per-label mean silhouette matches a from-scratch recomputation") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .collect().map(r => (r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    val centroids = vecs.groupBy(_._1).map { case (l, xs) =>
      val dim = xs.head._2.length
      l -> Array.tabulate(dim)(i => r6d(xs.map(_._2(i)).sum / xs.length))
    }
    def dist(e: Array[Double], c: Array[Double]): Double =
      e.indices.foldLeft(0.0)((acc, i) => acc + (e(i) - c(i)) * (e(i) - c(i)))
    val expected = vecs.map { case (label, emb) =>
      val a = dist(emb, centroids(label))
      val b = centroids.collect { case (l, c) if l != label => dist(emb, c) }.min
      (label, (b - a) / math.max(a, b))
    }.groupBy(_._1).map { case (l, xs) =>
      (l, xs.length.toLong, r6d(xs.map(_._2).sum / xs.length))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q289_silhouette")(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("n"), r.getAs[Double]("mean_sil")))
      .toSeq
    got.zip(expected).foreach { case ((gl, gn, gs), (el, en, es)) =>
      assert(gl == el && gn == en)
      assert(math.abs(gs - es) < 1e-6, s"label $gl: $gs vs $es")
    }
    // silhouette is bounded
    assert(got.forall(r => r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9))
  }

  test("q290: the bridge identity holds — net equals the sum of the four classes") {
    val rows = SparkEntry.queries("q290_growth_accounting")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getAs[Double]("new_rev") + r.getAs[Double]("expansion_rev") +
        r.getAs[Double]("contraction_rev") + r.getAs[Double]("churned_rev")
      assert(math.abs(parts - r.getAs[Double]("net_rev")) < 1e-3,
        s"${r.getAs[String]("week")}: $parts vs ${r.getAs[Double]("net_rev")}")
      assert(r.getAs[Double]("new_rev") >= 0 && r.getAs[Double]("expansion_rev") >= 0)
      assert(r.getAs[Double]("contraction_rev") <= 0 && r.getAs[Double]("churned_rev") <= 0)
    }
    // net over all weeks telescopes: first week's revenue is all-new and
    // the running sum of nets equals each week's total revenue
    val weekly = graft.core.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(date_trunc("week", col("ts"))).cast("string").as("week"))
      .agg(sum("value").as("total"))
      .collect().map(r => r.getAs[String]("week") -> r.getAs[Double]("total")).toMap
    var running = 0.0
    rows.sortBy(_.getAs[String]("week")).foreach { r =>
      running += r.getAs[Double]("net_rev")
      val wk = r.getAs[String]("week")
      // churn-only trailing weeks have no revenue row
      val expected = weekly.getOrElse(wk, 0.0)
      assert(math.abs(running - expected) < 0.01, s"$wk: running $running vs $expected")
    }
  }
}
