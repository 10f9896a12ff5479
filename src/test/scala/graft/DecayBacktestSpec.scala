package graft

import org.apache.spark.sql.functions._

/** Targeted checks for q291 (time-decay attribution) and q292
  * (seasonal-naive backtest). */
class DecayBacktestSpec extends SparkSuite {

  test("q291: credit conserves each attributed purchase's value exactly once") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val look = 7L * 86400L * 1000000L
    val clicksByUser = ev.filter(_._2 == "click").groupBy(_._1)
    // a purchase with >= 1 lookback click contributes its FULL value
    val attributedTotal = ev.filter(_._2 == "purchase").collect {
      case (u, _, pts, _, v)
        if clicksByUser.getOrElse(u, Array.empty)
          .exists(c => c._3 <= pts && c._3 > pts - look) => v
    }.sum
    val got = SparkEntry.queries("q291_attribution_time_decay")(spark, sf0001)
      .agg(sum("credited_value")).collect()(0).getDouble(0)
    assert(math.abs(got - attributedTotal) < 0.01,
      s"credit not conserved: $got vs $attributedTotal")
  }

  test("q291: a newer click earns more credit than an older one for the same purchase") {
    import spark.implicits._
    // one purchase, two clicks 1h and 25h before: weights 2^(-1/24) vs 2^(-25/24)
    val t0 = 1700000000000000L
    val rows = Seq(
      (1L, "purchase", t0, 100L, 10.0),
      (1L, "click", t0 - 3600L * 1000000, 90L, 0.0),
      (1L, "click", t0 - 25 * 3600L * 1000000, 91L, 0.0))
      .toDF("user_id", "event_type", "us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    rows.createOrReplaceTempView("decay_probe")
    val w1 = math.pow(2, -1.0 / 24)
    val w2 = math.pow(2, -25.0 / 24)
    val hourly = {
      val purchases = rows.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pts"),
          col("event_id").as("p_id"), col("value"))
      val clicks = rows.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("cts"))
      purchases.join(clicks, Seq("user_id"))
        .withColumn("w",
          pow(lit(2.0), -(col("pts") - col("cts")).cast("double") / lit(86400e6)))
        .withColumn("wsum", sum(col("w")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id", "p_id")))
        .select((col("value") * col("w") / col("wsum")).as("credit"),
          col("cts"))
        .orderBy(col("cts").desc)
        .collect()
    }
    assert(hourly.length == 2)
    val newer = hourly(0).getAs[Double]("credit")
    val older = hourly(1).getAs[Double]("credit")
    assert(newer > older)
    assert(math.abs(newer - 10.0 * w1 / (w1 + w2)) < 1e-9)
    assert(math.abs(newer + older - 10.0) < 1e-9)
  }

  test("q292: errors match a hand alignment by calendar day + 7") {
    val daily = graft.core.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => ((r.getString(0), r.getAs[java.sql.Date](1).toLocalDate), r.getLong(2)))
      .toMap
    val expected = daily.toSeq.flatMap { case ((tpe, day), cnt) =>
      daily.get((tpe, day.minusDays(7))).map(f => (tpe, cnt, f))
    }.groupBy(_._1).map { case (tpe, xs) =>
      val mae = xs.map(x => math.abs(x._2 - x._3)).sum.toDouble / xs.length
      val bias = xs.map(x => x._2 - x._3).sum.toDouble / xs.length
      tpe -> ((xs.length.toLong, mae, bias))
    }
    SparkEntry.queries("q292_seasonal_naive_backtest")(spark, sf0001)
      .collect().foreach { r =>
        val (n, mae, bias) = expected(r.getAs[String]("event_type"))
        assert(r.getAs[Long]("n_days") == n)
        assert(math.abs(r.getAs[Double]("mae") - mae) < 1e-4)
        assert(math.abs(r.getAs[Double]("bias") - bias) < 1e-4)
      }
  }
}
