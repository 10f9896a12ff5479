package graft

import org.apache.spark.sql.SparkSession

import graft.queries.QueryDef

/** Benchmark harness: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Execution is forced with the `noop` sink so the
  * full plan (scan→shuffle→agg/sort) runs — a bare `.count()` would let
  * Catalyst drop sorts and projections and under-report.
  *
  * A query that throws is recorded as `"error"` in the queries map (and
  * listed under `"errors"`), and the process exits nonzero — a crash must
  * fail the bench, never shorten it.
  */
object Bench {

  private def exec(spark: SparkSession, q: QueryDef, sfDir: String): Unit =
    q.run(spark, sfDir).write.format("noop").mode("overwrite").save()

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** Timed passes per query after warm-up; the reported time is the MEDIAN
    * so a single GC pause / compilation hiccup cannot fake a regression in
    * the round-over-round comparison (a single-sample bench flagged a
    * phantom 2.4x swing on an untouched query in round 2). */
  val TimedPasses = 3

  /** The FROZEN round-7 headline set (VERDICT r7 item 8): `shared_total`
    * sums exactly these queries every round, so round-over-round
    * comparison survives additions to the headline set — `value` remains
    * the full-set total. Do not edit this list; extend the headline flags
    * instead. */
  val SharedSet: Set[String] = Set(
    "q01_scan_project_sort", "q07_agg_pricing", "q16_join_revenue", "q61_tpch_q6",
    "q14_event_gaps", "q19_tumbling_window", "q26_dedup_exact", "q27_dedup_minhash",
    "q88_dedup_components", "q112_heavy_hitters", "q122_canonical_dedup",
    "q21_cosine_topk", "q31_ann_topk_brute", "q111_quantile_sketch_rollup",
    "q95_decontaminate", "q104_tokenize_encode")

  /** SCALE tier (r19, VERDICT r18 item 3): at sf0.1 every shared query is
    * sub-second, so host jitter swamps regressions and the driver's
    * 8-core control run TIED the 32-core run (every r18 scaling ratio
    * ≈ 1 — task overhead, not compute, set the wall time). These three
    * queries run the same operator shapes — scan→sort, join→agg,
    * explode→agg — over the SAME parquet inputs replicated
    * `SPARK_GRAFT_SCALE_REPL`× in-flight (a unionAll of identical scans,
    * re-planned and re-computed inside every timed pass: no persisted
    * intermediates, nothing keyed on the dataset across runs), sized so
    * parallelism is measurable. They are ADDED `queries` entries under
    * the existing methodology (same warm-up, 3-pass median, noop sink):
    * `shared_total` and the frozen [[SharedSet]] are untouched, and the
    * compact gate line stays the LAST stdout line. The replication
    * factor is env-parameterised with the local default 10 — at real
    * cluster scale you would bench the real data instead and set it
    * to 1/0. */
  val ScaleSet: Set[String] = Set(
    "x10_scan_project_sort", "x10_join_revenue_agg", "x10_shingle_hash")

  def scaleQueries(repl: Int): Seq[QueryDef] = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    // Round-robin redistribution after the union, sized 2× the session's
    // core count (scale-adaptive, never a constant): each sf0.1 fixture
    // file is far under maxPartitionBytes, so every union leg is ONE scan
    // task and map parallelism would cap at `repl` regardless of cores —
    // the first x10 measurement showed 8c≈32c for exactly that reason.
    // The repartition makes every downstream stage core-proportional,
    // which is what this tier exists to measure.
    def repN(df: DataFrame, n: Int): DataFrame =
      Seq.fill(n)(df).reduce(_ unionAll _)
        .repartition(2 * df.sparkSession.sparkContext.defaultParallelism)
    def rep(df: DataFrame): DataFrame = repN(df, repl)
    Seq(
      QueryDef(
        "x10_scan_project_sort",
        (s, d) =>
          rep(graft.core.Tables.lineitem(s, d))
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
            .orderBy(col("l_orderkey"), col("l_linenumber")),
        None),
      QueryDef(
        "x10_join_revenue_agg",
        (s, d) =>
          rep(graft.core.Tables.lineitem(s, d))
            .join(graft.core.Tables.orders(s, d),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
              count(lit(1)).as("n"),
              sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
            .orderBy("o_orderpriority"),
        None),
      QueryDef(
        // replaced x10_token_hist within r19 BEFORE any driver
        // measurement: a LOW-cardinality token histogram anti-scales
        // locally (each partition's partial aggregate holds nearly the
        // full vocabulary, so partial rows grow with the partition count
        // and 8 cores beat 32) — the CPU-parallelism probe must be
        // embarrassingly parallel compute. This one is: per row, hash
        // every word 3-shingle (xxhash64) and fold the hashes row-
        // locally; the only shuffle is the one-row global sum. 5× the
        // tier's factor so the hashing dominates scheduling.
        "x10_shingle_hash",
        (s, d) =>
          repN(graft.core.Tables.documents(s, d), 5 * repl)
            .select(split(col("text"), " ").as("_t"))
            // XOR folds (row-local and global): overflow-free under ANSI
            // while still forcing every shingle hash to be computed
            .select(expr(
              """aggregate(
                |  transform(sequence(1, greatest(size(_t) - 2, 0)),
                |    i -> xxhash64(concat_ws(' ', slice(_t, i, 3)))),
                |  0L, (a, x) -> a ^ x)""".stripMargin).as("s"))
            .agg(expr("bit_xor(s)").as("checksum"), count(lit(1)).as("n_docs")),
        None))
  }

  /** Runs warm-up + [[TimedPasses]] timed passes per query and reports the
    * per-query median; returns (detailLine, compactLine, ok). Separated
    * from main so the failure path is unit-testable with a
    * deliberately-broken QueryDef.
    *
    * TWO stdout lines, because the artifact capture is a bounded TAIL
    * (round 13: the plan-metrics map alone overflowed it and the timings
    * fell out of the recorded artifact — the bench stopped evidencing
    * itself). The DETAIL line (first) carries every per-query median plus
    * the executed-plan metrics map; the COMPACT line (LAST, so it is the
    * one a tail capture keeps) carries only the round-over-round gate:
    * shared_total, the frozen shared set's per-query medians, errors, ok.
    *
    * The detail line's plan map is the regression adjudicator
    * ([[graft.tools.PlanMetrics]]: files/bytes scanned, shuffle
    * bytes/records, spill, observed operator-internal cardinalities) from
    * one extra execution after the timed passes. Wall time alone cannot
    * adjudicate a regression — a 2× median swing on untouched code (q225,
    * round 12) is unanswerable without knowing whether the PLAN moved:
    * same files+shuffle ⇒ environment noise, moved numbers ⇒ a real plan
    * change to chase. */
  def run(spark: SparkSession, sfDir: String, headline: Seq[QueryDef]): (String, String, Boolean) = {
    // Warm-up execution per query (JIT + codegen cache + file listing).
    // Failures are ignored HERE only because the timed passes below run the
    // same plan and record them.
    headline.foreach { q =>
      try exec(spark, q, sfDir)
      catch { case _: Throwable => () }
    }
    val results: Seq[(String, Either[String, Double])] = headline.map { q =>
      val passes: Seq[Either[String, Double]] = (1 to TimedPasses).map { _ =>
        val t0 = System.nanoTime()
        try {
          exec(spark, q, sfDir)
          Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      }
      // Any failing pass fails the query — a flaky crash must not hide
      // behind two clean passes.
      q.name -> passes.collectFirst { case Left(msg) => Left(msg) }.getOrElse {
        val sorted = passes.collect { case Right(s) => s }.sorted
        Right(sorted(sorted.size / 2))
      }
    }
    // deterministic plan metrics per succeeded query (one extra
    // execution each, AFTER the timed passes so it cannot skew them)
    val plans: Map[String, graft.tools.PlanMetrics.Summary] = results.collect {
      case (name, Right(_)) =>
        val q = headline.find(_.name == name).get
        // a metrics failure must not fail a bench whose timed passes were
        // clean — the query's entry is simply omitted from "plan"
        scala.util.Try(name -> graft.tools.PlanMetrics.run(q.run(spark, sfDir)))
    }.collect { case scala.util.Success(kv) => kv }.toMap
    val planJson = results.collect { case (k, Right(_)) if plans.contains(k) =>
      val p = plans(k)
      val observed =
        if (p.observed.isEmpty) ""
        else
          ",\"observed\":" + p.observed.toSeq.sortBy(_._1)
            .map { case (ok2, ov) => jsonStr(ok2) + ":" + ov }
            .mkString("{", ",", "}")
      jsonStr(k) + ":" + s"""{"files":${p.filesRead},"bytes":${p.bytesRead},""" +
        s""""shuffle_bytes":${p.shuffleBytesWritten},""" +
        s""""shuffle_records":${p.shuffleRecordsWritten},"spill":${p.spillBytes},""" +
        s""""rows":${p.outputRows}$observed}"""
    }.mkString("{", ",", "}")
    def timesJson(keep: String => Boolean): String = results.collect {
      case (k, Right(sec)) if keep(k) => jsonStr(k) + ":" + sec
      case (k, Left(_)) if keep(k)    => jsonStr(k) + ":\"error\""
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(msg)) => jsonStr(k) + ":" + jsonStr(msg) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(sec)) => sec }.sum
    val sharedTotal = results.collect { case (k, Right(sec)) if SharedSet(k) => sec }.sum
    val ok = results.forall(_._2.isRight)
    val sharedN = results.count(r => SharedSet(r._1) && r._2.isRight)
    // shared_total LEADS both lines: it is the only round-over-round-
    // comparable number (the frozen 16-query set); `total` follows and
    // grows with the headline set, so it must never be read as a
    // regression signal.
    val detail =
      s"""{"metric":"bench_detail","value":$sharedTotal,"unit":"sec",""" +
        s""""shared_n":$sharedN,"total":$total,"headline_n":${results.size},""" +
        s""""queries":${timesJson(_ => true)},"plan":$planJson,""" +
        s""""errors":$errors,"ok":$ok,"sf":${jsonStr(sfDir)}}"""
    val compact =
      s"""{"metric":"shared_total","value":$sharedTotal,"unit":"sec",""" +
        s""""shared_n":$sharedN,"total":$total,"headline_n":${results.size},""" +
        s""""queries":${timesJson(k =>
          SharedSet(k) || ScaleSet(k) ||
            results.exists(r => r._1 == k && r._2.isLeft))},""" +
        s""""errors":$errors,"ok":$ok,"sf":${jsonStr(sfDir)}}"""
    (detail, compact, ok)
  }

  /** Persist the detail line to a file. The stdout artifact is a bounded
    * TAIL: the compact gate line survives it, but the plan-metrics map —
    * the regression adjudicator — mostly does not (round 14: only 10 of
    * 38 queries' plan entries were comparable between rounds, and
    * `observed.setsim.candidates` never reached the archived artifact at
    * all). A committed `bench_detail.json` makes every round's full plan
    * map diffable from artifacts alone. */
  def persistDetail(detail: String, path: String): Unit =
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    } catch {
      // a failed file write must not fail a bench whose runs were clean —
      // the detail line still went to stdout
      case e: Throwable => System.err.println(s"bench_detail write failed: $e")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus, "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Re-apply AFTER setLogLevel (which rebuilds logger levels), or the
    // bounded-window warning floods the bench tail the driver records.
    graft.core.GraftSession.quietLogs()

    // scale tier appended AFTER the headline set so the frozen shared
    // queries warm and time exactly as every prior round
    val repl = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPL", "10").toInt
    val qs = SparkEntry.registry.filter(_.headline) ++
      (if (repl >= 1) scaleQueries(repl) else Seq.empty)
    val (detail, compact, ok) = run(spark, sfDir, qs)
    // detail FIRST, compact LAST: a bounded tail capture of stdout must
    // always keep the gate line (round-13 lesson — the plan map had
    // pushed the timings out of the recorded artifact).
    println(detail)
    println(compact)
    persistDetail(detail,
      sys.env.getOrElse("SPARK_GRAFT_DETAIL_OUT", "bench_detail.json"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
