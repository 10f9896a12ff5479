package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Fmt.{r4, r6}
import graft.core.Tables

/** Nondeterministic/approximate operators (oracle-excluded by design,
  * SURVEY.md §5.3) plus ML and one-hot encoding entries.
  */
object Misc {

  /** Q44 — approximate quantiles (ref: IQR bounds via `approxQuantile`,
    * `Cleaning.scala:131-132`). Greenwald-Khanna sketch → rows-only check;
    * the spec asserts rank-error bounds vs the exact quantiles. */
  val q44 = QueryDef(
    "q44_approx_quantile",
    (s, d) =>
      Tables.lineitem(s, d)
        .agg(percentile_approx(
          col("l_extendedprice"), array(lit(0.25), lit(0.75)), lit(10000)).as("qs"))
        .select(
          round(element_at(col("qs"), 1), 4).as("q1_approx"),
          round(element_at(col("qs"), 2), 4).as("q3_approx")),
    None)

  /** Q45 — seeded Bernoulli sampling (ref: `reduction.scala:27-29`).
    * Engine-RNG-specific → rows-only; spec asserts reproducibility and
    * binomial bounds. */
  val q45 = QueryDef(
    "q45_sample",
    (s, d) =>
      Tables.lineitem(s, d)
        .sample(withReplacement = false, 0.5, 42L)
        .agg(count(lit(1)).as("cnt")),
    None)

  /** Q57 — linear-regression pipeline M1-M8 (ref: `MLOperations.scala`):
    * seeded split, assembler, min-max scaler, LR fit, relational metrics vs
    * mean baseline. Seed-dependent internals → rows-only; spec asserts
    * rmse < baseline_rmse (the reference's own success criterion,
    * `MLOperations.scala:151-167`). */
  val q57 = QueryDef(
    "q57_ml_linreg",
    (s, d) =>
      graft.ml.Regression.trainEval(
        s,
        graft.ml.Regression.docFeatures(Tables.documents(s, d))),
    None)

  /** Q58 — manual one-hot encoding of day-of-week (ref:
    * `Transformation.scala:23-39`; Spark `dayofweek` is 1=Sunday, DuckDB's
    * is 0=Sunday — the oracle shifts accordingly, SURVEY §7.4 risk 3). */
  val q58 = QueryDef(
    "q58_onehot_dow",
    (s, d) => {
      val dow = dayofweek(col("o_orderdate"))
      val flags = (1 to 7).map(i => when(dow === i, 1.0).otherwise(0.0).as(s"dow_$i"))
      Tables.orders(s, d)
        .select(flags: _*)
        .agg(
          sum(col("dow_1")).as("d1"), sum(col("dow_2")).as("d2"),
          sum(col("dow_3")).as("d3"), sum(col("dow_4")).as("d4"),
          sum(col("dow_5")).as("d5"), sum(col("dow_6")).as("d6"),
          sum(col("dow_7")).as("d7"))
    },
    Some("""SELECT CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 0 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS d1,
                   CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 1 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS d2,
                   CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 2 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS d3,
                   CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 3 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS d4,
                   CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 4 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS d5,
                   CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 5 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS d6,
                   CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 6 THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS d7
            FROM orders"""))

  /** Q90 — seeded stratified sampling (`sampleBy`: per-stratum Bernoulli
    * fractions — the "rebalance a skewed corpus by language/source"
    * curation op). Engine-RNG-specific → rows-only; the spec asserts
    * reproducibility, per-stratum binomial bounds, and that a zero
    * fraction drops its stratum entirely. */
  val q90 = QueryDef(
    "q90_stratified_sample",
    (s, d) =>
      Tables.documents(s, d)
        .stat.sampleBy("lang", Map("en" -> 0.25, "de" -> 0.5, "fr" -> 1.0), 42L)
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang"),
    None)

  /** Q105 — mergeable sketch rollup (the incremental-distinct pattern at
    * 100 TB): per-day DataSketches HLL sketches of the user set stored as
    * a BINARY COLUMN (`hll_sketch_agg`), then any rollup — here the whole
    * range — answered by `hll_union_agg` over the daily sketches instead
    * of re-scanning events. Precompute once, merge forever: the union is
    * commutative/idempotent, so the estimate is deterministic and
    * partition-order-proof. Engine-sketch-specific → rows-only; the spec
    * asserts the estimate lands within HLL error of exact and that the
    * merged estimate equals the direct whole-range sketch. */
  val q105 = QueryDef(
    "q105_sketch_rollup",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val daily = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily.agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
    },
    None)

  /** Q111 — mergeable QUANTILE sketch rollup (q105's pattern for
    * percentiles): per-day [[graft.functions.DdSketch]] sketches of order
    * totals, any rollup answered by merging bucket counts instead of
    * re-scanning — and, unlike t-digest/GK, the merge is a per-key ADD, so
    * the rolled-up estimate is bit-identical under any partitioning.
    * Sketch layout is engine-specific → rows-only; DdSketchSpec asserts
    * merged==direct, partition-order invariance, and the alpha
    * relative-error guarantee vs exact percentiles. */
  val q111 = QueryDef(
    "q111_quantile_sketch_rollup",
    (s, d) => {
      import graft.functions.DdSketch
      val o = Tables.orders(s, d)
        .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      val daily = o.groupBy("day").agg(DdSketch.sketch(col("o_totalprice")).as("sk"))
      daily
        .agg(count(lit(1)).as("n_days"), DdSketch.merge(col("sk")).as("sk"))
        .select(
          col("n_days"),
          round(DdSketch.quantileOf(col("sk"), 0.5), 4).as("p50"),
          round(DdSketch.quantileOf(col("sk"), 0.95), 4).as("p95"),
          round(DdSketch.quantileOf(col("sk"), 0.99), 4).as("p99"))
    },
    None,
    headline = true)

  /** Q116 — one-pass ANALYZE ([[graft.ops.TableStats]]): min/max/null-count
    * for four lineitem columns of four different types (long, string,
    * double, timestamp), all computed in ONE aggregation job — the
    * reference's per-column re-scan pattern (`Transformation.scala:53-57`,
    * `Cleaning.scala:104-106`) collapsed into a single pass. The oracle
    * recomputes every exact field; the HLL NDV estimate is engine-specific
    * and is asserted separately in TableStatsSpec (error bound vs exact
    * distinct + the one-job guarantee). */
  val q116 = QueryDef(
    "q116_table_stats",
    (s, d) =>
      graft.ops.TableStats
        .collect(
          Tables.lineitem(s, d),
          Seq("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"))
        .select("column", "min_s", "max_s", "null_count", "row_count")
        .orderBy("column"),
    Some("""WITH s AS (
              SELECT 'l_orderkey' AS "column",
                     CAST(MIN(l_orderkey) AS VARCHAR) AS min_s,
                     CAST(MAX(l_orderkey) AS VARCHAR) AS max_s,
                     CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
                     COUNT(*) AS row_count
              FROM lineitem
              UNION ALL
              SELECT 'l_returnflag',
                     CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR),
                     CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
              FROM lineitem
              UNION ALL
              SELECT 'l_quantity',
                     CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR),
                     CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
              FROM lineitem
              UNION ALL
              SELECT 'l_shipdate',
                     CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR),
                     CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
              FROM lineitem)
            SELECT * FROM s ORDER BY "column""""),
    headline = false)

  /** Q120 — incrementally-maintained rollup ([[graft.ops
    * .MaterializedRollup]]): orders split into three uneven increments by
    * order key, each merged into the versioned state table as partial
    * aggregates (count/sum/min/max vectors — one keyed shuffle of the
    * INCREMENT, never a corpus re-scan), final read vs the oracle's
    * one-shot GROUP BY over everything. Equality here IS the maintenance
    * correctness claim: merge-of-batches == aggregate-of-union. Sum scaled
    * to millions before rounding (q09's hazard note — reassociated double
    * accumulation at 1e9 magnitude). NDV sketch column excluded from the
    * declared projection (engine-specific; MaterializedRollupSpec asserts
    * merged==direct sketch equality). */
  val q120 = QueryDef(
    "q120_incremental_rollup",
    (s, d) => {
      val path = Scratch.dir("q120") + "/t"
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"), year(col("o_orderdate")).as("yr"),
        col("o_totalprice"), col("o_custkey"))
      Seq(0, 1, 2).foreach { i =>
        graft.ops.MaterializedRollup.refresh(
          s, path, o.filter(col("o_orderkey") % 3 === i),
          Seq("o_orderstatus", "yr"), "o_totalprice", "o_custkey")
      }
      graft.ops.MaterializedRollup.read(s, path, Seq("o_orderstatus", "yr"))
        .select(
          col("o_orderstatus"), col("yr"), col("n_rows"),
          r4(col("sum_v") / lit(1e6)).as("sum_mm"),
          r4(col("avg_v")).as("avg_price"),
          col("min_v"), col("max_v"))
        .orderBy("o_orderstatus", "yr")
    },
    Some("""SELECT o_orderstatus, CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
                   COUNT(*) AS n_rows,
                   ROUND(SUM(o_totalprice)/1000000.0, 4) AS sum_mm,
                   ROUND(AVG(o_totalprice), 4) AS avg_price,
                   MIN(o_totalprice) AS min_v,
                   MAX(o_totalprice) AS max_v
            FROM orders GROUP BY 1,2 ORDER BY 1,2"""))

  /** Q230 — trainable quality filter ([[graft.ml.QualityClassifier]],
    * the CCNet/fastText-style linear gate): weak provenance labels
    * (src0-4 treated as curated positives, src15-19 as crawl negatives),
    * logistic regression over six surface features, then the WHOLE corpus
    * scored by a pure row-local sigmoid expression (the fitted weights
    * fold back to raw feature units — no MLlib transformer near the
    * scan). Output: per-source doc counts + mean quality probability.
    * ML internals → rows-only check; QualityClassifierSpec pins AUC > 0.9
    * on a separable corpus and the expression-vs-model score equality. */
  val q230 = QueryDef(
    "q230_quality_classifier",
    (s, d) => {
      import graft.ml.QualityClassifier
      val docs = QualityClassifier.features(Tables.documents(s, d), "text")
      val pos = Set("src0", "src1", "src2", "src3", "src4")
      val neg = Set("src15", "src16", "src17", "src18", "src19")
      val labeled = docs
        .withColumn(
          "label",
          when(col("source").isInCollection(pos), 1.0)
            .when(col("source").isInCollection(neg), 0.0))
        .filter(col("label").isNotNull)
      val fitted = QualityClassifier.fit(s, labeled)
      QualityClassifier.score(docs, fitted)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), r4(avg(col("quality_prob"))).as("mean_quality"))
        .orderBy("source")
    },
    None)

  /** Q241 — quality-gate evaluation ([[graft.ml.Calibration]]): q230's
    * classifier scored on its weak-labeled subset, then precision /
    * recall / F1 at a 9-cutoff grid — ALL cutoffs from one aggregation
    * pass — plus the 10-bin reliability curve's ECE as a final row.
    * ML-output-derived → rows-only; CalibrationSpec pins the confusion
    * matrices, the one-scan plan, and known-calibration recovery. */
  val q241 = QueryDef(
    "q241_quality_threshold_sweep",
    (s, d) => {
      import graft.ml.{Calibration, QualityClassifier}
      val docs = QualityClassifier.features(Tables.documents(s, d), "text")
      val pos = Set("src0", "src1", "src2", "src3", "src4")
      val neg = Set("src15", "src16", "src17", "src18", "src19")
      val labeled = docs
        .withColumn(
          "label",
          when(col("source").isInCollection(pos), 1.0)
            .when(col("source").isInCollection(neg), 0.0))
        .filter(col("label").isNotNull)
      val fitted = QualityClassifier.fit(s, labeled)
      val scored = QualityClassifier.score(labeled, fitted)
      val sweep = Calibration.thresholdSweep(
        scored, "label", "quality_prob", (1 to 9).map(_ / 10.0))
      val eceRow = Calibration.ece(Calibration.reliability(scored, "label", "quality_prob"))
      sweep
        .withColumn("ece", round(lit(eceRow), 4))
        .orderBy("threshold")
    },
    None)

  /** Q246 — Jaro-Winkler similarity ranking
    * ([[graft.functions.JaroWinklerSim]], the record-linkage scorer):
    * top-20 part names by similarity to a probe string, ordered on the
    * ROUNDED score with the key as tie-break so the cut is deterministic
    * cross-engine. DuckDB ships the same textbook definition
    * (`jaro_winkler_similarity`), making the custom expression
    * oracle-exact over every fixture row — a wrong match window, missed
    * transposition halving, or boost-threshold slip reorders the top-20
    * and hash-fails. */
  val q246 = QueryDef(
    "q246_jw_topk",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"), col("p_name"),
          r6(graft.functions.JaroWinklerSim(col("p_name"), lit("small widget"))).as("sim"))
        .orderBy(col("sim").desc, col("p_partkey"))
        .limit(20),
    Some("""SELECT p_partkey, p_name,
           |       ROUND(jaro_winkler_similarity(p_name, 'small widget'), 6) AS sim
           |FROM part ORDER BY sim DESC, p_partkey LIMIT 20""".stripMargin))

  /** Q253 — CSV quarantine ingestion ([[graft.io.CsvQuarantine]]): a
    * scratch CSV is written from the documents table with every 17th
    * row's numeric field deliberately corrupted; the quarantine read
    * (string scan + try_cast validation — NOT the corrupt-record column,
    * whose filters push into the scan and mis-route; see the op's
    * scaladoc) routes parse failures to a `bad` frame instead of nulling
    * or crashing. The oracle never reads the CSV — it recomputes the
    * expected routing from the SAME planted rule over the source table,
    * so a router that drops, double-counts, or mis-splits one row
    * hash-fails. */
  val q253 = QueryDef(
    "q253_csv_quarantine",
    (s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.queries.Scratch.dir("q253") + "/feed"
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          when(col("doc_id") % 17 === 0, lit("xx"))
            .otherwise(col("n_chars").cast("string")).as("n_chars"),
          col("lang"))
        .write.option("header", "true").mode("overwrite").csv(dir)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_chars", LongType),
        StructField("lang", StringType)))
      val routed = graft.io.CsvQuarantine.read(s, dir, schema)
      val g = routed.good.agg(
        count(lit(1)).as("n_good"),
        sum(col("doc_id")).as("good_id_sum"),
        sum(col("n_chars")).as("good_chars_sum"),
        countDistinct(col("lang")).as("good_langs"))
      // bad rows keep their raw fields: the quarantine audit can still
      // total the ids that failed elsewhere in the row
      val b = routed.bad.agg(
        count(lit(1)).as("n_bad"),
        sum(col("doc_id").cast("long")).as("bad_id_sum"))
      g.crossJoin(b)
    },
    Some("""SELECT
              (SELECT COUNT(*) FROM documents WHERE doc_id % 17 <> 0) AS n_good,
              (SELECT CAST(SUM(doc_id) AS BIGINT) FROM documents WHERE doc_id % 17 <> 0) AS good_id_sum,
              (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents WHERE doc_id % 17 <> 0) AS good_chars_sum,
              (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents WHERE doc_id % 17 <> 0) AS good_langs,
              (SELECT COUNT(*) FROM documents WHERE doc_id % 17 = 0) AS n_bad,
              (SELECT CAST(SUM(doc_id) AS BIGINT) FROM documents WHERE doc_id % 17 = 0) AS bad_id_sum"""))

  /** Q256 — leave-one-out target encoding (the leakage-safe categorical
    * feature every tabular-ML pipeline ships): each row's category is
    * encoded as the mean target of the OTHER rows in its category,
    * (Σy − y)/(n − 1) — the row's own label never leaks into its feature.
    * One bounded per-category aggregate broadcast back against the scan;
    * singleton categories encode null (no peers to average). */
  val q256 = QueryDef(
    "q256_target_encoding",
    (s, d) => {
      val o = Tables.orders(s, d)
      val stats = o.groupBy("o_orderpriority")
        .agg(sum("o_totalprice").as("s"), count(lit(1)).as("n"))
      o.join(broadcast(stats), Seq("o_orderpriority"))
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          r4(when(col("n") > 1,
            (col("s") - col("o_totalprice")) / (col("n") - 1))).as("te_loo"))
        .orderBy("o_orderkey")
    },
    Some("""WITH st AS (SELECT o_orderpriority, SUM(o_totalprice) AS s, COUNT(*) AS n
           |            FROM orders GROUP BY 1)
           |SELECT o_orderkey, o.o_orderpriority,
           |       ROUND(CASE WHEN n > 1 THEN (s - o_totalprice) / (n - 1) END, 4) AS te_loo
           |FROM orders o JOIN st USING (o_orderpriority)
           |ORDER BY o_orderkey""".stripMargin))

  /** Q257 — blocked Jaro-Winkler entity-resolution join: candidate pairs
    * share a blocking key (first name word — the standard cheap blocker),
    * then the fused [[graft.functions.JaroWinklerSim]] scores each pair
    * inside the join's codegen stage and the ROUNDED score gates ≥ 0.93.
    * Pair volume is Σ block² — bounded by the blocker's selectivity,
    * never all-pairs; the oracle replays the identical block + score. */
  val q257 = QueryDef(
    "q257_jw_blocked_join",
    (s, d) => {
      val p = Tables.part(s, d).select(
        col("p_partkey"), col("p_name"),
        split(col("p_name"), " ").getItem(0).as("blk"))
      p.as("a").join(p.as("b"),
          col("a.blk") === col("b.blk") && col("a.p_partkey") < col("b.p_partkey"))
        .select(
          col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
          r6(graft.functions.JaroWinklerSim(col("a.p_name"), col("b.p_name"))).as("sim"))
        .filter(col("sim") >= 0.93)
        .orderBy("key_a", "key_b")
    },
    Some("""WITH p AS (SELECT p_partkey, p_name, str_split(p_name, ' ')[1] AS blk FROM part)
           |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           |       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim
           |FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
           |WHERE ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.93
           |ORDER BY key_a, key_b""".stripMargin))

  /** Q308 — JSONL quarantine ingestion ([[graft.io.JsonQuarantine]]):
    * q253's twin for the other ubiquitous feed format, exercising
    * JSON's EXTRA failure mode — a syntactically malformed line (CSV
    * cannot express one). The scratch feed plants both classes: every
    * 13th row's numeric field is the text "xx" (type corruption; a
    * PERMISSIVE read would silently null just that field) and every
    * 29th row gets a trailing '{' (malformed; PERMISSIVE nulls all).
    * The oracle never reads the JSONL — it recomputes the routing from
    * the same planted rules over the source table, so a router that
    * mis-classifies either class, drops a row, or double-counts the
    * 13·29 overlap hash-fails. */
  val q308 = QueryDef(
    "q308_json_quarantine",
    (s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.queries.Scratch.dir("q308") + "/feed"
      Tables.documents(s, d)
        .select(concat(
          // a LEADING '{' guarantees a parse failure (trailing garbage
          // can be silently ignored by lenient parsers); lines are built
          // by hand so good rows carry a real JSON NUMBER (a quoted
          // number would test the parser's string coercion, not routing)
          when(col("doc_id") % 29 === 0, lit("{")).otherwise(lit("")),
          lit("{\"doc_id\":"), col("doc_id").cast("string"),
          lit(",\"n_chars\":"),
          when(col("doc_id") % 13 === 0, lit("\"xx\""))
            .otherwise(col("n_chars").cast("string")),
          lit(",\"lang\":\""), col("lang"), lit("\"}")).as("value"))
        .write.mode("overwrite").text(dir)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("n_chars", LongType),
        StructField("lang", StringType)))
      val routed = graft.io.JsonQuarantine.read(s, dir, schema)
      val g = routed.good.agg(
        count(lit(1)).as("n_good"),
        sum(col("doc_id")).as("good_id_sum"),
        sum(col("n_chars")).as("good_chars_sum"))
      // well-formed bad rows keep raw fields for the audit; malformed
      // lines have no fields at all — both still count
      val b = routed.bad.agg(
        count(lit(1)).as("n_bad"),
        sum(when(col("is_malformed"), 1L).otherwise(0L)).as("n_malformed"),
        sum(col("raw_doc_id").cast("long")).as("bad_id_sum"))
      g.crossJoin(b)
    },
    Some("""SELECT
           |  (SELECT COUNT(*) FROM documents
           |   WHERE doc_id % 13 <> 0 AND doc_id % 29 <> 0) AS n_good,
           |  (SELECT CAST(SUM(doc_id) AS BIGINT) FROM documents
           |   WHERE doc_id % 13 <> 0 AND doc_id % 29 <> 0) AS good_id_sum,
           |  (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents
           |   WHERE doc_id % 13 <> 0 AND doc_id % 29 <> 0) AS good_chars_sum,
           |  (SELECT COUNT(*) FROM documents
           |   WHERE doc_id % 13 = 0 OR doc_id % 29 = 0) AS n_bad,
           |  (SELECT COUNT(*) FROM documents WHERE doc_id % 29 = 0) AS n_malformed,
           |  (SELECT CAST(SUM(doc_id) AS BIGINT) FROM documents
           |   WHERE doc_id % 13 = 0 AND doc_id % 29 <> 0) AS bad_id_sum""".stripMargin))

  /** Q310 — ORC round-trip with pushdown parity: Spark's OTHER built-in
    * columnar format must carry the same planner guarantees as parquet —
    * the closure writes the fact as ORC, re-reads with a selective
    * predicate, and REQUIRES the filter to appear in the ORC scan's
    * PushedFilters and the projection to prune ReadSchema to 3 columns
    * (a format whose scan decodes all 11 columns for a 3-column
    * aggregate would be silently 4× slower at 100 TB). The oracle
    * replays the aggregate from the parquet source — a lossy or
    * row-dropping format conversion hash-fails. */
  val q310 = QueryDef(
    "q310_orc_roundtrip",
    (s, d) => {
      import org.apache.spark.sql.execution.FileSourceScanExec
      val dir = graft.queries.Scratch.dir("q310") + "/orc"
      Tables.lineitem(s, d).write.mode("overwrite").orc(dir)
      val scan = s.read.orc(dir)
        .filter(col("l_quantity") >= 45)
        .select("l_returnflag", "l_quantity", "l_extendedprice")
      val meta = scan.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f.metadata
      }.getOrElse(sys.error("no file scan in the ORC plan"))
      require(meta("PushedFilters").contains("l_quantity"),
        s"predicate did not push into the ORC scan: ${meta("PushedFilters")}")
      require(!meta("ReadSchema").contains("l_orderkey"),
        s"projection did not prune the ORC read schema: ${meta("ReadSchema")}")
      scan.groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          r4(sum(col("l_quantity"))).as("sum_qty"),
          r4(sum(col("l_extendedprice"))).as("sum_price"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
           |       ROUND(SUM(l_quantity), 4) AS sum_qty,
           |       ROUND(SUM(l_extendedprice), 4) AS sum_price
           |FROM lineitem WHERE l_quantity >= 45
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q44, q45, q57, q58, q90, q105, q111, q116, q120, q230, q241, q246, q253,
      q256, q257, q308, q310)
}
