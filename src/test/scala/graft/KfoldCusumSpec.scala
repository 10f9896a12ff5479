package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Targeted checks for q279 (one-pass k-fold CV) and q280 (CUSUM
  * change-point): the CV output is validated against the NAIVE method —
  * actually holding out each fold and averaging the rest — so the
  * one-pass algebra (not just the arithmetic) is what's under test; the
  * change-point is recomputed from scratch on the driver.
  */
class KfoldCusumSpec extends SparkSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q279: one-pass folds match the naive hold-one-fold-out computation") {
    val data = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity").collect()
      .map { r =>
        val key = s"cv-v1:${r.getLong(0)}:${r.getInt(1)}"
        (Integer.parseInt(md5hex(key).take(4), 16) % 5, r.getDouble(2))
      }
    val byFold = data.groupBy(_._1)
    val got = SparkEntry.queries("q279_kfold_cv")(spark, sf0001).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val fold = r.getAs[Int]("fold")
      val holdOut = byFold(fold).map(_._2)
      val train = data.filter(_._1 != fold).map(_._2)
      val mOut = train.sum / train.length
      val rmse = math.sqrt(holdOut.map(y => (y - mOut) * (y - mOut)).sum / holdOut.length)
      assert(r.getAs[Long]("n") == holdOut.length)
      assert(math.abs(r.getAs[Double]("mean_out") - mOut) < 1e-6, s"fold $fold mean")
      assert(math.abs(r.getAs[Double]("rmse") - rmse) < 1e-6, s"fold $fold rmse")
    }
  }

  test("q280: change-point day matches a from-scratch driver recomputation") {
    val daily = graft.core.Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("x")))
    val expected = daily.groupBy(_._1).map { case (tpe, xs) =>
      val days = xs.sortBy(_._2)
      val total = days.map(_._3).sum
      val n = days.length
      var s = 0L
      val cusums = days.zipWithIndex.map { case ((_, day, x), i) =>
        s += x
        val c = BigDecimal(s - (i + 1).toDouble * total / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (day, c)
      }
      val best = cusums.sortBy { case (day, c) => (-math.abs(c), day) }.head
      tpe -> (best._1, best._2, n.toLong)
    }
    val got = SparkEntry.queries("q280_cusum_changepoint")(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[String]("cp_day"), r.getAs[Double]("peak_cusum"),
          r.getAs[Long]("n_days"))).toMap
    assert(got == expected)
  }

  test("q280: a synthetic level shift is located at the shift day") {
    import spark.implicits._
    // 20 days at 10/day then 20 days at 30/day: |CUSUM| peaks at day 20
    val rows = (1 to 40).flatMap { day =>
      val n = if (day <= 20) 10 else 30
      Seq.fill(n)(("shift", f"2024-01-$day%02d"))
    }
    // Reuse the query's arithmetic inline on a local frame
    val daily = rows.toDF("event_type", "day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val cusum = daily
      .withColumn("t", row_number().over(w))
      .withColumn("s_t", sum(col("x")).over(w))
      .withColumn("total", sum(col("x")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .withColumn("n_days", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .withColumn("cusum",
        col("s_t") - col("t") * col("total").cast("double") / col("n_days"))
    val peak = cusum.orderBy(abs(col("cusum")).desc, col("day")).first()
    assert(peak.getAs[String]("day") == "2024-01-20")
  }
}
