package graft

import org.apache.spark.sql.functions._

import graft.ops.{RobustStats, Skyline}

/** Independent checks for the statistical-profiling operators behind
  * q193-q196 (the oracle gate re-checks them against DuckDB; here we
  * verify against brute-force / in-memory recomputations and assert the
  * scale-relevant plan shapes).
  */
class StatsOpsSpec extends SparkSuite {

  test("skyline matches the quadratic dominance test on sf0.001") {
    val per = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("best_price"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = per.filter { case (_, xa, ya) =>
      !per.exists { case (_, xb, yb) =>
        xb >= xa && yb >= ya && (xb > xa || yb > ya)
      }
    }.map(t => (t._1, t._2, t._3)).sortBy(_._1)

    val got = SparkEntry.queries("q196_skyline_customers")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == brute.toSeq)
    assert(got.nonEmpty)
  }

  test("skyline keeps mutually non-dominating ties on both coordinates") {
    import spark.implicits._
    val df = Seq((1L, 5L, 10.0), (2L, 5L, 10.0), (3L, 5L, 9.0), (4L, 4L, 11.0), (5L, 4L, 10.5))
      .toDF("id", "x", "y")
    val got = Skyline.maxMax2D(df, "x", "y").select("id").as[Long].collect().sorted
    // (5,10) twice: neither strictly dominates the other; (4,11) has larger y.
    assert(got.toSeq == Seq(1L, 2L, 4L))
  }

  test("MAD outliers match an in-memory recomputation per event type") {
    val rows = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      val values = vs.map(_._2)
      val med = medianOf(values)
      val ads = values.map(v => math.abs(v - med))
      val mad = medianOf(ads)
      k -> ads.count(_ > 3 * mad).toLong
    }

    val got = RobustStats
      .madOutliers(graft.core.Tables.events(spark, sf0001), "event_type", "value", 3.0)
      .select("event_type", "outliers")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == expected)
  }

  test("equi-depth bins cover all rows with near-equal depth") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val total = li.count()
    val bins = SparkEntry.queries("q194_equidepth_bins")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(bins.values.sum == total)
    assert(bins.keys.forall(b => b >= 0 && b <= 9))
    // l_quantity is a whole number in [1, 50]: ties make depths uneven, but
    // every bin should stay within a small factor of the ideal decile.
    val ideal = total / 10.0
    assert(bins.values.forall(c => c < 3 * ideal), s"skewed bins: $bins")
  }

  test("correlation matrix values are in [-1, 1] and match stat.corr") {
    val row = SparkEntry.queries("q193_correlation_matrix")(spark, sf0001).collect()(0)
    val vals = row.schema.fieldNames.map(f => f -> row.getAs[Double](f))
    vals.foreach { case (f, v) => assert(v >= -1.0 && v <= 1.0, s"$f = $v") }
    val independent = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .stat.corr("l_quantity", "l_extendedprice")
    assert(math.abs(row.getAs[Double]("corr_quantity_extendedprice") - independent) < 1e-4)
  }

  test("benford digits are 1..9 and shares sum to ~1") {
    val rows = SparkEntry.queries("q199_benford_audit")(spark, sf0001).collect()
    val digits = rows.map(_.getAs[Long]("digit"))
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 0.01)
    // Benford expectation column is the closed form, independent of data
    rows.foreach { r =>
      val d = r.getAs[Long]("digit").toDouble
      assert(math.abs(r.getAs[Double]("benford") - math.log10(1 + 1 / d)) < 1e-4)
    }
  }

  test("cusum change-point matches an in-memory exact-integer recomputation") {
    val daily = graft.core.Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").count()
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val total = sorted.map(_._3).sum
      val n = sorted.length.toLong
      var s = 0L
      val scored = sorted.zipWithIndex.map { case ((_, day, cnt), idx) =>
        s += cnt
        (day, math.abs(n * s - (idx + 1) * total))
      }
      // argmax with earliest-day tie-break
      val maxC = scored.map(_._2).max
      t -> scored.filter(_._2 == maxC).minBy(_._1)
    }
    val got = SparkEntry.queries("q200_cusum_changepoint")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("association rules: confidence and lift consistent with counts") {
    val rows = SparkEntry.queries("q201_association_rules")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val inc = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "event_type").distinct()
    val users = inc.select("user_id").distinct().count().toDouble
    val typeCnt = inc.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("antecedent"), r.getAs[String]("consequent"))
      val both = r.getAs[Long]("n_both").toDouble
      assert(math.abs(r.getAs[Double]("support") - both / users) < 1e-3)
      assert(math.abs(r.getAs[Double]("confidence") - both / typeCnt(a)) < 1e-3)
      assert(math.abs(r.getAs[Double]("lift") - both * users / (typeCnt(a) * typeCnt(b))) < 1e-3)
    }
    // rules come in symmetric-support pairs: n_both(a,b) == n_both(b,a)
    val m = rows.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_both")).toMap
    m.foreach { case ((a, b), n) => assert(m((b, a)) == n) }
  }

  test("drift monitor: exact-integer KS matches an in-memory recomputation") {
    val rows = graft.core.Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val binOf = (v: Double) => math.floor(v / 10.0).toLong
      val ref = rs.filter(_._2 < "2024-01-16").map(r => binOf(r._3))
      val live = rs.filter(_._2 >= "2024-01-16").map(r => binOf(r._3))
      val bins = (ref ++ live).distinct.sorted
      val (nRef, nLive) = (ref.length.toLong, live.length.toLong)
      var (sRef, sLive, best) = (0L, 0L, 0L)
      bins.foreach { b =>
        sRef += ref.count(_ == b); sLive += live.count(_ == b)
        best = math.max(best, math.abs(sRef * nLive - sLive * nRef))
      }
      t -> (nRef, nLive, best)
    }
    val got = SparkEntry.queries("q203_distribution_drift")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
    // PSI is finite and non-negative-ish sane on every type
    SparkEntry.queries("q203_distribution_drift")(spark, sf0001).collect().foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(!psi.isNaN && !psi.isInfinite && psi >= 0.0, s"psi=$psi")
    }
  }

  test("set-sim join plan: prefix-filtered equi-joins only, no quadratic shape") {
    val df = SparkEntry.queries("q211_setsim_join_exact")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"quadratic pair join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"quadratic pair join:\n$plan")
  }

  test("drift monitor windows are partitioned per event type") {
    val df = SparkEntry.queries("q203_distribution_drift")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(event_type"), s"cumulative window not keyed:\n$plan")
  }

  test("skyline plan: no cartesian/nested-loop self-join, threshold join broadcast") {
    val df = SparkEntry.queries("q196_skyline_customers")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"quadratic self-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"quadratic self-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"threshold join not broadcast:\n$plan")
  }
}
