package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  ApproximatePercentile, HyperLogLogPlusPlus, Percentile}
import org.apache.spark.sql.functions._

/** GraftExtensions: SQL functions + the approx-swap optimizer rule arrive
  * via `spark.sql.extensions` (no Registry.registerAll call anywhere in
  * these tests — the shared session gets them from GraftSession.builder).
  */
class ExtensionsSpec extends SparkSuite {

  test("injected SQL functions match their Scala-API forms") {
    val r = spark.sql(
      """SELECT round(cosine_similarity(array(1.0d, 2.0d), array(2.0d, 4.0d)), 6) AS cs,
                graft_token_count('the quick brown fox') AS tc,
                graft_fingerprint('abc') AS fp,
                interleave_bits(2, 3) AS z,
                canonical_text('  The QUICK,,  brown\tfox!! ') AS canon""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(1) == 4)
    // h("abc") = ((0*31+97)*31+98)*31+99 mod 1e9+7
    assert(r.getLong(2) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(r.getLong(3) == 14L) // x=10b,y=11b -> 1110b (int args coerce)
    assert(r.getString(4) == "the quick brown fox")

    // minhash_sig through SQL == the Column API on the same hash array
    val df = spark.sql(
      "SELECT minhash_sig(array(11L, 222L, 3333L), 8) AS sig")
    val viaColumn = spark.range(1)
      .select(graft.functions.MinHashSigExpr(
        typedLit(Seq(11L, 222L, 3333L)), 8).as("sig"))
    assert(df.head().getSeq[Long](0) == viaColumn.head().getSeq[Long](0))
  }

  test("minhash_sig rejects a non-literal permutation count") {
    val err = intercept[Throwable] {
      spark.sql("SELECT minhash_sig(array(1L), cast(id AS INT)) FROM range(1)").collect()
    }
    val messages = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" ")
    assert(messages.toLowerCase.contains("literal"))
  }

  test("approx swap is OFF by default: percentile and count-distinct stay exact") {
    val plan = spark.sql(
      """SELECT percentile(l_extendedprice, 0.5), count(DISTINCT l_partkey)
         FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`""")
      .queryExecution.optimizedPlan
    val aggs = plan.flatMap(_.expressions).flatMap(_.collect {
      case p: Percentile => p
      case h: HyperLogLogPlusPlus => h
      case a: ApproximatePercentile => a
    })
    assert(aggs.exists(_.isInstanceOf[Percentile]))
    assert(!aggs.exists(_.isInstanceOf[ApproximatePercentile]))
    assert(!aggs.exists(_.isInstanceOf[HyperLogLogPlusPlus]))
  }

  test("approx swap ON rewrites to sketches and stays within tolerance") {
    val sql =
      """SELECT percentile(l_extendedprice, 0.5) AS p50,
                count(DISTINCT l_partkey) AS nd
         FROM parquet.`/root/testdata/sf0.01/lineitem.parquet`"""
    val exact = spark.sql(sql).head()
    spark.conf.set("spark.graft.approx.enabled", "true")
    try {
      val q = spark.sql(sql)
      val swapped = q.queryExecution.optimizedPlan.flatMap(_.expressions).flatMap(_.collect {
        case a: ApproximatePercentile => a
        case h: HyperLogLogPlusPlus => h
      })
      assert(swapped.exists(_.isInstanceOf[ApproximatePercentile]))
      assert(swapped.exists(_.isInstanceOf[HyperLogLogPlusPlus]))
      val approx = q.head()
      // schema must be unchanged by the swap (the cast-back contract)
      assert(q.schema == spark.sql(sql).schema)
      assert(math.abs(approx.getDouble(0) - exact.getDouble(0)) / exact.getDouble(0) < 0.01)
      assert(math.abs(approx.getLong(1) - exact.getLong(1)).toDouble / exact.getLong(1) < 0.05)
    } finally spark.conf.unset("spark.graft.approx.enabled")
  }

  test("approx swap honors the documented sketch error contracts (rank error + rsd)") {
    // VERDICT r2 item 9: the approx mode's CONTRACT, not just its plan
    // rewrite. approx_percentile guarantees a RANK within n/accuracy of
    // the target rank (value-relative error is NOT guaranteed); HLL++ at
    // default precision documents rsd ~= 5% — assert 3 sigma.
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val vals = li.select("l_extendedprice")
      .collect().map(_.getDouble(0)).sorted
    val n = vals.length
    val exactDistinct = li.select("l_orderkey").distinct().count()
    spark.conf.set("spark.graft.approx.enabled", "true")
    try {
      for (p <- Seq(0.1, 0.5, 0.9)) {
        val got = li.agg(expr(s"percentile(l_extendedprice, $p)")).head().getDouble(0)
        // the sketch returns a real element; its feasible rank interval
        // [count(<v), count(<=v)] must overlap target +- n/accuracy
        val lo = vals.count(_ < got)
        val hi = vals.count(_ <= got)
        val tol = n.toDouble / ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY + 1
        assert(lo <= p * n + tol && hi >= p * n - tol,
          s"p=$p: rank interval [$lo,$hi] outside ${p * n} +- $tol (n=$n)")
      }
      val cd = li.agg(expr("count(distinct l_orderkey)")).head().getLong(0)
      assert(math.abs(cd - exactDistinct).toDouble / exactDistinct <= 0.15,
        s"HLL++ estimate $cd vs exact $exactDistinct exceeds 3x rsd")
    } finally spark.conf.unset("spark.graft.approx.enabled")
  }

  test("approx swap leaves weighted percentile (frequency != 1) exact") {
    spark.conf.set("spark.graft.approx.enabled", "true")
    try {
      val plan = spark.sql(
        """SELECT percentile(l_extendedprice, 0.5, l_linenumber)
           FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`""")
        .queryExecution.optimizedPlan
      val percs = plan.flatMap(_.expressions).flatMap(_.collect { case p: Percentile => p })
      assert(percs.nonEmpty)
    } finally spark.conf.unset("spark.graft.approx.enabled")
  }
}
