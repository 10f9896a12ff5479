package graft

import org.apache.spark.sql.functions._

/** Smoke + spot-check every registry query at sf0.001. The full
  * correctness gate is the driver's DuckDB oracle (Verify + oracle_sql);
  * here we assert structure and a few independently-computed values.
  */
class QueriesSpec extends SparkSuite {

  // queries whose legitimate result can be empty on the small fixture
  private val mayBeEmpty = Set(
    "q18b_except", "q27_dedup_minhash", "q28_dedup_simhash",
    "q30_embedding_neardup", "q32_ann_topk_lsh")

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and is sane") {
      val df = q.run(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("driver entry point returns rows (t1 smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has at most one registry entry") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("q02 count matches independent filter") {
    val expected = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .where("l_quantity > 45").count()
    val got = SparkEntry.queries("q02_filter_count")(spark, sf0001)
      .collect()(0).getLong(0)
    assert(got == expected)
  }

  test("q07 group count and total quantity") {
    val rows = SparkEntry.queries("q07_agg_pricing")(spark, sf0001).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val totalCnt = rows.map(_.getAs[Long]("cnt")).sum
    assert(totalCnt == spark.read.parquet(s"$sf0001/lineitem.parquet").count())
  }

  test("q18c union-all count = |customer| + |supplier|") {
    val c = spark.read.parquet(s"$sf0001/customer.parquet").count()
    val s = spark.read.parquet(s"$sf0001/supplier.parquet").count()
    val got = SparkEntry.queries("q18c_union_all_count")(spark, sf0001)
      .collect()(0).getLong(0)
    assert(got == c + s)
  }

  test("q24 rollup row count = detail + per-flag subtotals + grand total") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val detail = li.select("l_returnflag", "l_linestatus").distinct().count()
    val flags = li.select("l_returnflag").distinct().count()
    val got = SparkEntry.queries("q24_rollup")(spark, sf0001).count()
    assert(got == detail + flags + 1)
  }

  test("q31 brute-force top-5: five rows per probe, sims descending") {
    val rows = SparkEntry.queries("q31_ann_topk_brute")(spark, sf0001)
      .orderBy(col("probe_id"), col("sim").desc).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    byProbe.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val sims = rs.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("oracle SQL exists for every non-excluded query") {
    val rowsOnly = Set(
      "q27_dedup_minhash", "q28_dedup_simhash", "q32_ann_topk_lsh",
      "q44_approx_quantile", "q45_sample", "q57_ml_linreg",
      "q66_approx_distinct", "q67_ann_topk_ivf", "q90_stratified_sample",
      "q105_sketch_rollup", "q107_fractional_mixing",
      "q111_quantile_sketch_rollup", "q117_semantic_dedup",
      "q138_repeated_spans_hashed", "q143_bpe_vocab", "q145_ann_topk_pq",
      "q160_bpe_encode", "q169_mv_distinct_sketch", "q222_pca_whiten",
      "q230_quality_classifier", "q234_compression_quality",
      "q241_quality_threshold_sweep", "q273_mmr_select", "q303_wau_hll",
      "q354_isolation_forest")
    SparkEntry.registry.foreach { q =>
      assert(q.oracle.isDefined != rowsOnly(q.name), s"oracle mismatch for ${q.name}")
    }
    // the artifact and this allowlist share one source of truth: what
    // Verify writes to rows_only.json is exactly this set
    assert(SparkEntry.rowsOnly.toSet == rowsOnly,
      s"rows_only artifact drifted from the allowlist: ${
        (SparkEntry.rowsOnly.toSet diff rowsOnly) ++ (rowsOnly diff SparkEntry.rowsOnly.toSet)}")
  }
}
