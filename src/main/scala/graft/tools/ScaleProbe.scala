package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.core.Tables
import graft.functions.TextFunctions
import graft.ops.SetSimJoin

/** One-shot scaling probe for the bench's heavy hitters (VERDICT r10
  * item 4): times q211/q225/q88/q138/q137 on a given fixture dir (noop
  * sink, one warm + one timed pass) and prints the volume drivers —
  * q211's candidate-pair counts per filter stage and q88's duplicate-edge
  * count — so a 10× corpus shows whether cost and candidates grow
  * linearly or super-linearly. Diagnostics only, not contract surface. */
object ScaleProbe {

  private val Heavy = Seq(
    "q211_setsim_join_exact", "q225_cluster_safe_split",
    "q88_dedup_components", "q138_repeated_spans_hashed",
    "q137_repeated_spans",
    // r12: the per-token-explode family (VERDICT r11 item 6) — the one
    // new shape without measured scaling evidence
    "q264_content_chunks", "q265_chunk_dedup_strip", "q250_pack_sequences",
    // r13: the survival/stats shapes with band-join/explode fan-out
    // (VERDICT r12 item 6) — events- and orders-backed, so probe them
    // with a name filter against an events/orders replica fixture
    "q296_kaplan_meier", "q299_subsample_ci",
    // r13: the bucketed-join shape (write-once-shuffle): the probe times
    // BOTH bucketed ingests and the exchange-free join
    "q325_bucketed_join",
    // r14: the r13/r14 statistics family (VERDICT r13 item 6) — all
    // closed-from-moments / calendar-grid shapes on paper; probed so the
    // claim is measured, not assumed (q299's B×hash fan-out hid in an
    // identical-looking shape). Probe fixture: events/orders/customer/
    // lineitem replicated 10× with key offsets, nation/part shared.
    "q320_theil_decomposition", "q322_cox_hazard", "q324_mann_whitney",
    "q326_bh_fdr", "q327_spearman", "q328_ratio_ci", "q329_kruskal_wallis",
    "q331_ks_two_sample", "q332_holt_winters", "q333_winsorized_mean",
    "q334_effect_size", "q336_cox_multivariate", "q337_holt_winters_mult",
    "q339_cox_stratified", "q340_sequential_monitor", "q341_welch_anova",
    "q342_always_valid_p",
    // r15: the layout-composition queries (VERDICT r14 item 6 named
    // q335/q338 explicitly — their maintenance rewrites and MV refresh
    // are the parts that could scale badly) plus the round's new
    // operators (Efron Cox, bucket point lookup, composite bucketing,
    // CUPED)
    "q335_bucketed_maintenance_join", "q338_mv_over_bucketed_fact",
    "q343_cox_efron_ties", "q344_bucket_point_lookup",
    "q345_composite_bucket_join", "q346_cuped",
    // r15 (second batch): Firth Cox (third-moment agg columns), the
    // Bayesian A/B sums (driver flops ∝ conversions — the one shape
    // whose cost grows with the DATA, not the grid), SRM
    "q348_cox_firth", "q349_bayes_ab", "q350_srm_check",
    // r15 (third batch): adjusted survival curves (grid-sized baseline
    // off the existing final pass), power/MDE (one moments agg),
    // Cochran's Q homogeneity (segment-grid agg + two guard probes)
    "q351_cox_survival", "q352_power_mde", "q353_hte_homogeneity",
    // r15: isolation forest — the ψ·T sample TopK is the only
    // data-sized stage; scoring is row-local broadcast traversal
    "q354_isolation_forest",
    // r15: counting-process Cox — the doubled (entry-echo) frame is the
    // scale question: same one-agg-per-iteration shape, 2× rows
    "q355_cox_time_varying",
    // r15: adjusted RMST — the q351 fit + a grid-sized partitioned window
    "q356_adjusted_rmst",
    // r15: recurrent-event Cox with the cluster sandwich — the residual
    // pass adds two as-of joins + one keyed fold on top of the fit
    "q357_cox_robust_cluster",
    // r15: PH-assumption score test — grid arithmetic off the fit
    "q358_cox_ph_test",
    // r15: multi-covariate CUPED — one wider moments pass, p×p driver solve
    "q359_cuped_multi",
    // r16: cluster-robust CUPED / clustered MDE (one extra keyed agg to
    // the cluster grid), RMST with the Greenwood-type variance (grid
    // arithmetic off the existing fit), typed-stats pruning and bucket
    // doubling (both build scratch versioned tables — the probe times
    // the WHOLE lifecycle, ingest included)
    "q360_cuped_cluster", "q361_mde_cluster", "q362_rmst_ci",
    "q363_typed_prune", "q364_bucket_double_join",
    // r16 (second batch): RMST contrast + survival bands (grid
    // arithmetic off the fit, like q362)
    "q365_rmst_diff", "q366_survival_bands",
    // r17: convergence-bounded Cox (the early exit must stay flat at
    // 10× — fewer passes, same per-pass shape), the continuous
    // always-valid monitor (daily moments agg + calendar-grid windows)
    // and the A/B/n readout (one arm-grid agg + a k-row BH window)
    "q369_cox_converged", "q370_always_valid_mean", "q372_multi_arm_fdr",
    "q373_multi_arm_cuped",
    // r18: the sequential A/B/n grids (one arm×day agg + calendar
    // windows + per-look BH) and the cluster-level CUPED monitor (the
    // clusters×calendar grid is the design-sized state in question)
    "q374_multi_arm_sequential", "q375_multi_arm_seq_cuped",
    "q377_cluster_seq_cuped",
    // the cluster-randomized A/B/n pair: clusters×calendar grid +
    // (day, arm) moments + the broadcast-sized contrast/BH tail
    "q378_multi_arm_clustered", "q379_multi_arm_cluster_seq")

  /** STREAMING probe (VERDICT r15 item 8): replay the events table as a
    * 20-micro-batch file stream through [[graft.streaming.EventStreams
    * .streamingSrm]] and the CUPED scorecard sink, and report wall
    * time, throughput and — the scale claim itself — the MAX stateful
    * rows the run ever held. Both operators keep ONE state row per open
    * window (arms are conditional counter COLUMNS, the CUPED moments
    * ride the same row), so a 10× replay must show ~10× rows at the
    * SAME state size: state is O(windows × arms), never O(rows). The
    * watermark is set beyond the fixture's calendar so unordered file
    * replay drops nothing — every window stays open, which is the
    * WORST-CASE state bound. */
  private def probeStreaming(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("probe_stream").toString
    val ev = Tables.events(spark, sfDir).select(
      col("ts"), col("user_id"),
      when((conv(substring(md5(concat(lit("ab-v1:"), col("user_id").cast("string"))),
        1, 4), 16, 10).cast("int") % 2) === 1, lit("treat")).otherwise(lit("ctrl"))
        .as("arm"),
      (col("event_type") === "purchase").cast("int").as("conv"))
    val srcDir = s"$tmp/src"
    ev.repartition(20).write.parquet(srcDir)
    val nRows = spark.read.parquet(srcDir).count()
    val schema = spark.read.parquet(srcDir).schema
    def fileStream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    def runStream(name: String)(start: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val t0 = System.nanoTime()
      val q = start(fileStream())
      try {
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val stateMax = q.recentProgress
          .flatMap(p => p.stateOperators.map(_.numRowsTotal)).maxOption.getOrElse(0L)
        val batches = q.recentProgress.count(_.numInputRows > 0)
        println(f"[probe] $name%-28s rows=$nRows%9d batches=$batches%3d " +
          f"wall=$sec%7.2f s state_rows_max=$stateMax%6d " +
          f"rows_per_sec=${nRows / math.max(sec, 1e-9)}%.0f")
      } finally q.stop()
    }
    runStream("streaming_srm") { src =>
      graft.streaming.EventStreams.streamingSrm(
        src, "arm", "ts", Seq("ctrl" -> 0.5, "treat" -> 0.5),
        windowLen = "1 hour", watermark = "3650 days")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ck_srm")
        .outputMode("append").start()
    }
    // the CUPED dim: one pre-period covariate row per user, broadcast
    // into every micro-batch (the enrichWithDim shape)
    val dim = ev.groupBy("user_id").agg(count(lit(1)).cast("double").as("pre_x"))
      .localCheckpoint(true)
    runStream("scorecard_sink_cuped") { src =>
      graft.streaming.EventStreams.startExperimentScorecardSink(
        src, "arm", "conv", "ts", focal = "treat", control = "ctrl",
        focalShare = 0.5, tablePath = s"$tmp/scorecard",
        writerId = "probe", checkpointDir = s"$tmp/ck_sc",
        windowLen = "1 hour", watermark = "3650 days",
        preCovariate = Some((dim, "user_id", "pre_x")))
    }
    // the CLUSTERED scorecard chains two stateful aggregations: state is
    // O(windows × clusters) — with a fixed 97-geo clustering a 10× replay
    // must hold state constant (windows × 97 at the first operator,
    // windows at the second)
    runStream("scorecard_sink_clustered") { src =>
      graft.streaming.EventStreams.startExperimentScorecardSink(
        src.withColumn("geo", pmod(col("user_id"), lit(97)).cast("string"))
          .withColumn("arm",
            when(pmod(col("user_id"), lit(97)) % 2 === 1, lit("treat"))
              .otherwise(lit("ctrl"))),
        "arm", "conv", "ts", focal = "treat", control = "ctrl",
        focalShare = 0.5, tablePath = s"$tmp/scorecard_cl",
        writerId = "probe-cl", checkpointDir = s"$tmp/ck_sc_cl",
        windowLen = "1 hour", watermark = "3650 days",
        preCovariate = Some((dim, "user_id", "pre_x")),
        clusterCol = Some("geo"))
    }
    // the MULTI-ARM scorecard: one (window, arm) stateful aggregation —
    // with 4 hash arms on a fixed calendar a 10× replay must hold state
    // at windows × 4, while the fold's arm ledger stays 4 rows
    runStream("scorecard_sink_multi_arm") { src =>
      graft.streaming.EventStreams.startMultiArmScorecardSink(
        src.withColumn("arm",
          concat(lit("a"), pmod(col("user_id"), lit(4)).cast("string"))),
        "arm", "conv", "ts", control = "a0",
        tablePath = s"$tmp/scorecard_abn", writerId = "probe-abn",
        checkpointDir = s"$tmp/ck_sc_abn",
        windowLen = "1 hour", watermark = "3650 days",
        preCovariate = Some((dim, "user_id", "pre_x")),
        expectedShares = Some(Map(
          "a0" -> 0.25, "a1" -> 0.25, "a2" -> 0.25, "a3" -> 0.25)))
    }
    // the CLUSTERED multi-arm scorecard keys (window, cluster, arm):
    // with 97 geos each owning ONE of 4 arms, state must track
    // windows × 97 (pure clusters carry one arm) — flat at 10× rows
    runStream("scorecard_multi_arm_cl") { src =>
      graft.streaming.EventStreams.startMultiArmScorecardSink(
        src.withColumn("geo", pmod(col("user_id"), lit(97)).cast("string"))
          .withColumn("arm",
            concat(lit("a"), (pmod(col("user_id"), lit(97)) % 4).cast("string"))),
        "arm", "conv", "ts", control = "a0",
        tablePath = s"$tmp/scorecard_abn_cl", writerId = "probe-abn-cl",
        checkpointDir = s"$tmp/ck_sc_abn_cl",
        windowLen = "1 hour", watermark = "3650 days",
        preCovariate = Some((dim, "user_id", "pre_x")),
        clusterCol = Some("geo"))
    }
    graft.queries.Scratch.rmTree(new java.io.File(tmp))
  }

  /** REFRESH probe (VERDICT r16 item 6): the incremental corpus-refresh
    * capstone's scale claim is "work ∝ increment, NOT resident corpus" —
    * so refresh the SAME increment against a ~10% resident and the full
    * resident and compare walls. The bootstrap (whole-resident sign +
    * k-means) is timed separately: it SHOULD grow with the resident;
    * the increment refresh should not (the ledger-side band rows grow,
    * but they are 3-column longs riding one keyed shuffle — the
    * deployment contract buckets that side). */
  private def probeRefresh(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val emb = Tables.embeddings(spark, sfDir)
    val increment = docs.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val residentLarge = docs.filter(col("doc_id") % 10 =!= 0)
    val residentSmall = residentLarge.filter(col("doc_id") % 10 === 1)
    val nInc = increment.count()
    for ((label, resident) <- Seq(
        "resident_small" -> residentSmall, "resident_large" -> residentLarge)) {
      val tmp = java.nio.file.Files.createTempDirectory(s"probe_refresh_$label").toString
      val table = s"$tmp/corpus"
      val ledger = graft.ops.Dedup.DedupLedger(s"$tmp/bands", s"$tmp/sketches")
      val nRes = resident.count()
      val v1 = graft.io.VersionedTable.commitAppend(resident, table)
      val (_, bootSec) = timed(graft.pipeline.CorpusRefresh.refresh(
        spark, table, None, ledger, ivfPath = Some(s"$tmp/ivf"),
        embeddings = Some(emb), embVecCol = "embedding",
        minJaccard = 0.8, ivfNlist = 64))
      graft.io.VersionedTable.commitAppend(increment, table)
      val ((rep, _), incSec) = timed(graft.pipeline.CorpusRefresh.refresh(
        spark, table, Some(v1), ledger, ivfPath = Some(s"$tmp/ivf"),
        embeddings = Some(emb), embVecCol = "embedding",
        minJaccard = 0.8, ivfNlist = 64))
      println(f"[probe] refresh_$label%-22s resident=$nRes%8d increment=$nInc%7d " +
        f"bootstrap=$bootSec%7.2f s increment_refresh=$incSec%7.2f s " +
        f"pairs=${rep.nearDupPairs}%6d survivors=${rep.survivors}%7d " +
        f"ivf_appended=${rep.vectorsAppended}%7d")
      graft.queries.Scratch.rmTree(new java.io.File(tmp))
    }
  }

  /** REBUCKET probe (VERDICT r16 item 7): a REALISTIC bucket count.
    * The lifecycle spec covers 8 → 32; the declared at-scale bound ("a
    * 1000-bucket doubling is bounded by cluster capacity") rests on the
    * conf-width split pool and per-bucket single-task sorts — so
    * measure a 256 → 512 doubling on lineitem and report wall AND the
    * max single task duration (the per-bucket sort+split is one task;
    * its max is what an executor core actually pays, pool width only
    * schedules them). */
  private def probeRebucket(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("probe_rebucket").toString
    val table = s"$tmp/li"
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val n = li.count()
    val t0 = System.nanoTime()
    graft.io.VersionedTable.commitBucketed(li, table, "l_orderkey", 256)
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t1 = System.nanoTime()
    val r = graft.io.VersionedTable.rebucketInto(spark, table, 512)
    val wallSec = (System.nanoTime() - t1) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    val width = spark.conf.getOption("spark.graft.rebucket.splitPoolWidth").getOrElse("64")
    println(f"[probe] rebucket_256_to_512        rows=$n%9d ingest=$ingestSec%7.2f s " +
      f"wall=$wallSec%7.2f s max_task=${maxTaskMs.get()}%6d ms " +
      f"files=${r.filesWritten}%4d local=${r.local} buckets_per_job=$width")
    graft.queries.Scratch.rmTree(new java.io.File(tmp))
  }

  /** `ScaleProbe <fixtureDir> [names,csv|streaming|refresh|rebucket]` —
    * the optional second arg restricts to the named queries (skipping
    * the q211/q88 volume-driver sections, which read the documents
    * table), or runs the STREAMING / incremental-REFRESH / REBUCKET
    * probe when it is that literal. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.drop(1).headOption.contains("rebucket")) {
      val cpus0 = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
      val s = graft.core.GraftSession.builder(s"local[$cpus0]", cpus0, "scaleprobe").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      println(s"[probe] dir=$sfDir cpus=$cpus0 mode=rebucket")
      probeRebucket(s, sfDir)
      s.stop()
      return
    }
    if (args.drop(1).headOption.contains("refresh")) {
      val cpus0 = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
      val s = graft.core.GraftSession.builder(s"local[$cpus0]", cpus0, "scaleprobe").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      println(s"[probe] dir=$sfDir cpus=$cpus0 mode=refresh")
      probeRefresh(s, sfDir)
      s.stop()
      return
    }
    if (args.drop(1).headOption.contains("streaming")) {
      val cpus0 = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
      val s = graft.core.GraftSession.builder(s"local[$cpus0]", cpus0, "scaleprobe").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      println(s"[probe] dir=$sfDir cpus=$cpus0 mode=streaming")
      probeStreaming(s, sfDir)
      s.stop()
      return
    }
    val onlyNames = args.drop(1).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus, "scaleprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    if (onlyNames.isEmpty) {
      val nDocs = Tables.documents(spark, sfDir).count()
      println(s"[probe] dir=$sfDir docs=$nDocs cpus=$cpus")
    } else println(s"[probe] dir=$sfDir cpus=$cpus only=${onlyNames.get.mkString(",")}")

    Heavy.filter(n => onlyNames.forall(_.contains(n))).foreach { name =>
      val run = SparkEntry.queries(name)
      def exec() = run(spark, sfDir).write.format("noop").mode("overwrite").save()
      try {
        exec() // warm (JIT + listing)
        val (_, sec) = timed(exec())
        println(f"[probe] $name%-28s $sec%8.2f s")
      } catch { case e: Throwable =>
        println(s"[probe] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

    if (onlyNames.isDefined) { spark.stop(); return }

    // q211 volume drivers (stage replica kept in sync with SetSimJoin by
    // hand — same fragment as ProfileSetSim)
    val t = 0.6
    val tok = SetSimJoin.wordShingles(Tables.documents(spark, sfDir), "doc_id", "text", 3)
      .select(col("id"), col("w")).distinct()
    val freq = tok.groupBy("w").agg(count(lit(1)).as("df"))
    val sets = tok.join(freq, "w")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("es"))
      .select(col("id"), expr("transform(es, e -> e.w)").as("ws"), size(col("es")).as("sz"))
    val prefix = sets
      .select(col("id"), col("sz"),
        posexplode(expr(s"slice(ws, 1, size(ws) - cast(ceil($t * size(ws)) as int) + 1)"))
          .as(Seq("p0", "w")))
      .select(col("id"), col("sz"), (col("p0") + 1).as("r"), col("w"))
    val minOverlap = ceil(lit(t / (1 + t)) * (col("a.sz") + col("b.sz")) - lit(1e-9))
    val joined = prefix.as("a").join(prefix.as("b"), Seq("w"))
      .filter(col("a.id") < col("b.id"))
      .filter(col("a.sz") * lit(t) <= col("b.sz") && col("b.sz") * lit(t) <= col("a.sz"))
    val pos = joined.filter(
      lit(1) + least(col("a.sz") - col("a.r"), col("b.sz") - col("b.r")) >= minOverlap)
    val (rawN, _) = timed(joined.count())
    val (posN, _) = timed(pos.count())
    val (candN, _) = timed(pos.select(col("a.id"), col("b.id")).distinct().count())
    val (pairN, _) = timed(SetSimJoin.selfJoin(
      SetSimJoin.wordShingles(Tables.documents(spark, sfDir), "doc_id", "text", 3), t).count())
    println(s"[probe] q211 raw_prefix_pairs=$rawN positional=$posN " +
      s"distinct_candidates=$candN final_pairs=$pairN")

    // q88 volume driver: rare-shingle duplicate edges
    val docs = Tables.documents(spark, sfDir)
      .filter(TextFunctions.tokenCount(col("text")) >= 3)
    val edges = docs.select(
        col("doc_id"),
        explode(graft.functions.ShingleHashSetExpr(
          TextFunctions.tokens(col("text")), 3)).as("h"))
      .groupBy("h").agg(
        count(lit(1)).as("df"),
        min(col("doc_id")).as("src"),
        max(col("doc_id")).as("dst"))
      .filter(col("df") === 2)
      .select("src", "dst")
      .distinct()
    val (edgeN, _) = timed(edges.count())
    println(s"[probe] q88 duplicate_edges=$edgeN")
    spark.stop()
  }
}
