package graft

import org.apache.spark.sql.functions._

import graft.functions.WeightedAvg

class MiscOpsSpec extends SparkSuite {
  import spark.implicits._

  test("seeded sample is reproducible and within binomial bounds") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val n = li.count().toDouble
    val a = li.sample(withReplacement = false, 0.5, 42L).count()
    val b = li.sample(withReplacement = false, 0.5, 42L).count()
    assert(a == b)
    // 6 sigma binomial tolerance around n/2
    val sigma = math.sqrt(n * 0.25)
    assert(math.abs(a - n / 2) < 6 * sigma)
  }

  test("stratified sample is reproducible, bounded per stratum, and drops zero-fraction strata") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val fractions = Map("en" -> 0.25, "de" -> 0.5, "fr" -> 0.0)
    def run() = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a == run(), "same seed must reproduce the same strata")
    assert(!a.contains("fr"), "zero fraction must drop the stratum")
    assert(!a.contains("zh"), "unlisted strata default to fraction 0")
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, f) <- fractions if f > 0 && totals.contains(lang)) {
      val n = totals(lang).toDouble
      val sigma = math.sqrt(n * f * (1 - f))
      assert(math.abs(a.getOrElse(lang, 0L) - n * f) < 6 * sigma + 1,
        s"stratum $lang count ${a.getOrElse(lang, 0L)} outside binomial bounds of ${n * f}")
    }
  }

  test("approx quantiles land within rank-error bound of exact quantiles") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val approx = li.stat.approxQuantile("l_extendedprice", Array(0.25, 0.75), 0.001)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.25, 0.75), 0.0)
    // relativeError 0.001 on ~6000 rows -> rank within ~6; compare values
    // at ranks +-0.002*n of the exact quantile
    val sorted = li.select("l_extendedprice").orderBy("l_extendedprice")
      .collect().map(_.getDouble(0))
    val n = sorted.length
    def bound(p: Double, v: Double): Boolean = {
      val lo = sorted(math.max(0, (p * n).toInt - math.max(1, (0.002 * n).toInt) - 1))
      val hi = sorted(math.min(n - 1, (p * n).toInt + math.max(1, (0.002 * n).toInt)))
      v >= lo && v <= hi
    }
    assert(bound(0.25, approx(0)) && bound(0.75, approx(1)))
    assert(exact.length == 2)
  }

  test("ml regression beats the mean baseline on the learnable target") {
    val metrics = SparkEntry.queries("q57_ml_linreg")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(metrics("rmse") < metrics("baseline_rmse"))
    assert(metrics("r2") > 0.9)
  }

  test("ml regression reports one coefficient per feature plus intercept, reproducibly") {
    def run(): Map[String, Double] =
      SparkEntry.queries("q57_ml_linreg")(spark, sf0001)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = run()
    val coefs = a.keys.filter(_.startsWith("coef_")).toSet
    assert(coefs == Set("coef_n_tokens", "coef_n_types", "coef_n_letters"))
    assert(a.contains("intercept"))
    // fixed seed (split + deterministic solver) -> identical model across runs
    val b = run()
    (coefs + "intercept").foreach(k => assert(a(k) == b(k), s"$k not reproducible"))
  }

  test("weighted-avg Aggregator via udaf matches manual computation") {
    spark.udf.register("weighted_avg", org.apache.spark.sql.functions.udaf(WeightedAvg))
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("v", "w")
    df.createOrReplaceTempView("wa_t")
    val got = spark.sql("SELECT weighted_avg(v, w) FROM wa_t").collect()(0).getDouble(0)
    assert(math.abs(got - 17.5) < 1e-12)
  }

  test("hll sketch rollup: merged daily sketches estimate within error of exact") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val exact = ev.select("user_id").distinct().count()
    val daily = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    // default lgConfigK=12 -> rsd ~1.6%; allow 3 sigma
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged estimate $merged vs exact $exact")
    // merging dailies must equal sketching the whole range directly —
    // the precompute-once contract
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))).head().getLong(0)
    assert(merged == direct)
  }

  test("group-by sum is invariant under repartitioning (property)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val base = li.groupBy("l_returnflag").agg(round(sum("l_quantity"), 6).as("s"))
      .orderBy("l_returnflag").collect().toSeq
    Seq(1, 7, 64).foreach { p =>
      val re = li.repartition(p).groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 6).as("s")).orderBy("l_returnflag").collect().toSeq
      assert(re == base, s"repartition($p) changed rounded group sums")
    }
  }

  test("dropDuplicates is idempotent") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val once = li.dropDuplicates("l_partkey", "l_suppkey")
    assert(once.count() == once.dropDuplicates("l_partkey", "l_suppkey").count())
  }
}
