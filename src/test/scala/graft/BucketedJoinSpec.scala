package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Hash-bucketed versioned tables ([[VersionedTable.commitBucketed]]):
  * the write-once-shuffle layout. Two tables bucketed the same way join
  * on the key with ZERO exchanges (the 100 TB fact-to-fact shape);
  * appends accumulate per-bucket files; any non-bucketed commit drops
  * the claim and reads fall back to the unbucketed scan — correctness
  * never depends on the layout. */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("vt_bucket").toString + "/tbl"

  private def rows(ids: Range, p: String) =
    ids.map(i => (i.toLong, s"${p}_$i")).toDF("id", "v")

  private def shuffles(df: DataFrame): Int = {
    df.collect() // force AQE final plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
        case other => other +: other.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("co-bucketed tables join on the key with zero exchanges; rows exact") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 1000, "a"), a, "id", 8)
    VersionedTable.commitBucketed(rows(500 until 1500, "b"), b, "id", 8)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 8)))

    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ shape
    try {
      val joined = VersionedTable.table(spark, a).as("a")
        .join(VersionedTable.table(spark, b).as("b"), "id")
        .select(col("id"), col("a.v").as("va"), col("b.v").as("vb"))
      assert(shuffles(joined) == 0,
        s"co-bucketed join must plan with zero exchanges:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 500)
      // the unbucketed control pays two exchanges on the same data
      val pa = fresh(); val pb = fresh()
      VersionedTable.commitAppend(rows(0 until 1000, "a"), pa)
      VersionedTable.commitAppend(rows(500 until 1500, "b"), pb)
      val plain = VersionedTable.table(spark, pa).as("a")
        .join(VersionedTable.table(spark, pb).as("b"), "id")
      assert(shuffles(plain) > 0, "control: unbucketed join must shuffle")
      // a single-table aggregation on the bucket key also skips its shuffle
      val agg = VersionedTable.table(spark, a).groupBy("id").agg(count(lit(1)))
      assert(shuffles(agg) == 0, "groupBy on the bucket key must not exchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
  }

  test("sorted buckets: fresh tables skip the SMJ sort; compactBucketed restores it") {
    def sorts(df: DataFrame): Int = {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
          case other => other +: other.children.flatMap(walk)
        }
      walk(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    }
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 500, "a"), a, "id", 4)
    VersionedTable.commitBucketed(rows(0 until 500, "b"), b, "id", 4)
    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def joined() = VersionedTable.table(spark, a).as("x")
        .join(VersionedTable.table(spark, b).as("y"), "id")
        .select(col("id"), col("x.v"))
      // one file per bucket: the SMJ runs with ZERO sorts and zero exchanges
      assert(shuffles(joined()) == 0 && sorts(joined()) == 0,
        s"single-file buckets must skip both:\n${joined().queryExecution.executedPlan}")
      // an append dilutes to >1 file per bucket: exchanges still zero,
      // sorts come back (Spark drops the order claim, never correctness)
      VersionedTable.commitBucketed(rows(500 until 700, "a"), a, "id", 4)
      assert(shuffles(joined()) == 0)
      assert(sorts(joined()) > 0, "multi-file buckets must re-sort")
      assert(joined().count() == 500)
      // the maintenance op restores one sorted file per bucket
      VersionedTable.compactBucketed(spark, a)
      assert(VersionedTable.bucketing(spark, a).contains(("id", 4)))
      assert(shuffles(joined()) == 0 && sorts(joined()) == 0,
        "compactBucketed must restore the sort-free join")
      assert(joined().count() == 500)
      assert(VersionedTable.read(spark, a).count() == 700)
      // unbucketed tables refuse the bucketed compactor
      val plain = fresh()
      VersionedTable.commitAppend(rows(0 until 10, "p"), plain)
      val e = intercept[IllegalArgumentException](
        VersionedTable.compactBucketed(spark, plain))
      assert(e.getMessage.contains("no bucketing claim"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
  }

  test("bucketed appends accumulate per-bucket files; mismatched layout refuses") {
    val path = fresh()
    VersionedTable.commitBucketed(rows(0 until 300, "x"), path, "id", 4)
    VersionedTable.commitBucketed(rows(300 until 600, "y"), path, "id", 4)
    assert(VersionedTable.read(spark, path).count() == 600)
    assert(VersionedTable.table(spark, path).count() == 600)
    // every key lands in exactly one bucket across commits: group by id
    // over the bucketed scan stays exchange-free AND exact
    val g = VersionedTable.table(spark, path).groupBy("id").count()
    assert(g.filter(col("count") =!= 1).count() == 0)
    // mismatched n or key refuses loudly
    val e1 = intercept[IllegalArgumentException](
      VersionedTable.commitBucketed(rows(0 until 10, "z"), path, "id", 8))
    assert(e1.getMessage.contains("not bucketed by"))
    val e2 = intercept[IllegalArgumentException](
      VersionedTable.commitBucketed(
        Seq((1L, "q")).toDF("id", "v"), path, "v", 4))
    assert(e2.getMessage.contains("not bucketed by"))
    // bucketed-append onto a PLAIN table refuses (carried files are unbucketed)
    val plain = fresh()
    VersionedTable.commitAppend(rows(0 until 10, "p"), plain)
    intercept[IllegalArgumentException](
      VersionedTable.commitBucketed(rows(10 until 20, "p"), plain, "id", 4))
  }

  test("streaming bucketed sink keeps the table join-ready; replays absorb; DESCRIBE shows it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = fresh()
    val ms = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("bk_ckpt").toString
    val q = graft.streaming.EventStreams.startBucketedVersionedSink(
      ms.toDS().toDF("id", "v"), path, "id", 4, "bkw", ckpt)
    try {
      ms.addData((0L until 100L).map(i => (i, s"a_$i")): _*); q.processAllAvailable()
      ms.addData((100L until 160L).map(i => (i, s"b_$i")): _*); q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.bucketing(spark, path).contains(("id", 4)),
      "the claim must persist across micro-batches")
    assert(VersionedTable.read(spark, path).count() == 160)
    // joins against the streamed table stay exchange-free
    val other = fresh()
    VersionedTable.commitBucketed(rows(0 until 200, "o"), other, "id", 4)
    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = VersionedTable.table(spark, path)
        .join(VersionedTable.table(spark, other), "id")
      assert(shuffles(j) == 0, "streamed bucketed table must stay join-ready")
      assert(j.count() == 160)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
    // a replayed micro-batch (crash between commit and checkpoint) no-ops
    val replay = VersionedTable.commitBucketedBatch(
      rows(0 until 100, "a"), path, "id", 4, "bkw", 0L)
    assert(replay.isEmpty && VersionedTable.read(spark, path).count() == 160)
    // DESCRIBE DETAIL surfaces the layout claim
    val det = spark.sql(s"DESCRIBE DETAIL `$path`").collect()(0)
    assert(det.getAs[String]("bucketing") == "id:4")
  }

  test("SQL INSERT INTO a bucketed table honors the layout instead of dropping it") {
    val path = fresh()
    VersionedTable.commitBucketed(rows(0 until 100, "x"), path, "id", 4)
    spark.conf.set("spark.sql.catalog.vtbk", classOf[graft.sources.VtCatalog].getName)
    spark.sql(s"INSERT INTO vtbk.`$path` SELECT id + 100, concat('s_', id) FROM range(50)")
    assert(VersionedTable.bucketing(spark, path).contains(("id", 4)),
      "SQL append must keep the table join-ready")
    assert(VersionedTable.read(spark, path).count() == 150)
    // INSERT OVERWRITE replaces the layout along with the data (documented)
    spark.sql(s"INSERT OVERWRITE vtbk.`$path` SELECT id, concat('o_', id) FROM range(10)")
    assert(VersionedTable.bucketing(spark, path).isEmpty)
    assert(VersionedTable.read(spark, path).count() == 10)
  }

  test("bucketSkew flags a hot key; counts ride the manifest (metadata-only)") {
    val path = fresh()
    // 900 of 1000 rows share one key -> one bucket holds >= 90%
    val skewed = (0 until 1000).map(i => (if (i < 900) 7L else i.toLong, s"r$i"))
      .toDF("id", "v")
    VersionedTable.commitBucketed(skewed, path, "id", 4)
    val (perBucket, ratio) = VersionedTable.bucketSkew(spark, path)
    assert(perBucket.values.sum == 1000L)
    assert(perBucket.values.max >= 900L, s"hot bucket must carry the hot key: $perBucket")
    assert(ratio >= 3.5, s"skew ratio must flag it (got $ratio)")
    // counts recorded at commit: countRows takes the no-scan path and agrees
    assert(VersionedTable.countRows(spark, path) == 1000L)
    // a balanced table reads near 1
    val even = fresh()
    VersionedTable.commitBucketed(rows(0 until 1000, "e"), even, "id", 4)
    val (_, r2) = VersionedTable.bucketSkew(spark, even)
    assert(r2 < 1.5, s"balanced layout must not flag (got $r2)")
    // unbucketed tables refuse
    val plain = fresh()
    VersionedTable.commitAppend(rows(0 until 10, "p"), plain)
    intercept[IllegalArgumentException](VersionedTable.bucketSkew(spark, plain))
  }

  test("a claim over an unparseable file degrades to the unbucketed scan, never throws") {
    val path = fresh()
    VersionedTable.commitBucketed(rows(0 until 100, "x"), path, "id", 4)
    // simulate a foreign file under the claim (manifest surgery): strip
    // one file's bucket suffix on disk and in the version manifest
    val vfile = new java.io.File(s"$path/_versions").listFiles()
      .filter(_.getName.endsWith(".json")).minBy(_.getName)
    val text = new String(java.nio.file.Files.readAllBytes(vfile.toPath), "UTF-8")
    val suffixed = "_(\\d{5})\\.".r.findFirstIn(text)
    assert(suffixed.isDefined, "fixture must have suffixed files")
    val victim = "\"([^\"]+_\\d{5}[^\"]*)\"".r.findFirstMatchIn(text).get.group(1)
    val renamed = victim.replaceAll("_\\d{5}", "")
    assert(new java.io.File(s"$path/data/$victim")
      .renameTo(new java.io.File(s"$path/data/$renamed")))
    // crc sidecar would fail the checksum read after a content-preserving
    // rename of the manifest; drop it (test-only surgery)
    new java.io.File(s"$path/_versions/.${vfile.getName}.crc").delete()
    java.nio.file.Files.write(vfile.toPath,
      text.replace(victim, renamed).getBytes("UTF-8"))
    // claim still present, but the scan must fall back rather than throw
    assert(VersionedTable.bucketing(spark, path).contains(("id", 4)))
    assert(VersionedTable.table(spark, path).count() == 100)
    assert(VersionedTable.table(spark, path)
      .queryExecution.sparkPlan.toString.contains("Bucketed: false") ||
      !VersionedTable.table(spark, path)
        .queryExecution.sparkPlan.toString.contains("Bucketed: true"),
      "guarded scan must not claim bucketing over an unparseable file")
  }

  test("CREATE TABLE CLUSTERED BY INTO BUCKETS: the claim holds from v1 through SQL inserts") {
    spark.conf.set("spark.sql.catalog.vtddl", classOf[graft.sources.VtCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("vt_ddl").toString
    spark.conf.set("spark.sql.catalog.vtddl.warehouse", wh)
    spark.sql(
      "CREATE TABLE vtddl.orders (id BIGINT, v STRING) CLUSTERED BY (id) INTO 4 BUCKETS")
    assert(VersionedTable.bucketing(spark, s"$wh/orders").contains(("id", 4)),
      "the claim must exist from version 1")
    spark.sql("INSERT INTO vtddl.orders SELECT id, concat('r_', id) FROM range(300)")
    spark.sql("INSERT INTO vtddl.orders SELECT id + 300, concat('s_', id) FROM range(100)")
    assert(VersionedTable.bucketing(spark, s"$wh/orders").contains(("id", 4)))
    assert(VersionedTable.read(spark, s"$wh/orders").count() == 400)
    // the DDL-created table joins exchange-free against a Scala-bucketed one
    val other = fresh()
    VersionedTable.commitBucketed(rows(0 until 200, "o"), other, "id", 4)
    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = VersionedTable.table(spark, s"$wh/orders")
        .join(VersionedTable.table(spark, other), "id")
      assert(shuffles(j) == 0, "DDL-created bucketed table must be join-ready")
      assert(j.count() == 200)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
    // hive-style PARTITIONED BY still refuses with a pointed message
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE vtddl.bad (id BIGINT, d STRING) PARTITIONED BY (d)"))
    assert(e.getMessage.contains("CLUSTERED BY"))
  }

  test("a non-bucketed commit drops the claim; reads stay correct unbucketed") {
    val path = fresh()
    VersionedTable.commitBucketed(rows(0 until 200, "x"), path, "id", 4)
    VersionedTable.commitAppend(rows(200 until 250, "plain"), path)
    assert(VersionedTable.bucketing(spark, path).isEmpty,
      "a plain append must drop the bucketing claim")
    assert(VersionedTable.table(spark, path).count() == 250)
    assert(VersionedTable.read(spark, path).count() == 250)
    // time travel to the bucketed version still reports the claim
    assert(VersionedTable.bucketing(spark, path, Some(1L)).contains(("id", 4)))
  }

  test("deleteWhere preserves the claim: the post-delete co-bucketed join plans zero exchanges") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 1000, "a"), a, "id", 8)
    VersionedTable.commitBucketed(rows(0 until 1000, "b"), b, "id", 8)
    // delete rewrites only the files holding doomed keys; survivors go
    // back through the bucketed writer so the claim — and the
    // shuffle-free join — survives (VERDICT r13 item 2: one delete must
    // not re-impose the full join shuffle on a bucketed fact table)
    val (_, deleted) = VersionedTable.deleteWhere(spark, a, col("id") < 100L)
    assert(deleted == 100L)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 8)),
      "deleteWhere must keep the bucketing claim")
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a).as("a")
        .join(VersionedTable.table(spark, b).as("b"), "id")
        .select(col("id"), col("a.v").as("va"), col("b.v").as("vb"))
      assert(shuffles(joined) == 0,
        s"post-delete co-bucketed join must plan with zero exchanges:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 900)
      // rows exact: the deleted keys are gone, every survivor intact
      assert(VersionedTable.read(spark, a).count() == 900)
      assert(VersionedTable.read(spark, a).agg(min(col("id"))).head.getLong(0) == 100L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    // bucket accounting stays metadata-only after the rewrite (every
    // manifest file carries a recorded count)
    val (perBucket, _) = VersionedTable.bucketSkew(spark, a)
    assert(perBucket.values.sum == 900L)
  }

  test("compact preserves the claim; repacked rows land back in their buckets") {
    val a = fresh(); val b = fresh()
    // several small bucketed appends → many small per-bucket files
    (0 until 4).foreach { k =>
      VersionedTable.commitBucketed(rows(k * 100 until (k + 1) * 100, "a"), a, "id", 4)
    }
    VersionedTable.commitBucketed(rows(0 until 400, "b"), b, "id", 4)
    val (_, rewritten) = VersionedTable.compact(spark, a, targetRowsPerFile = 1000L)
    assert(rewritten > 0, "small per-bucket files must be compaction candidates")
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "compact must keep the bucketing claim")
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a)
        .join(VersionedTable.table(spark, b), "id")
      assert(shuffles(joined) == 0,
        s"post-compact co-bucketed join must plan with zero exchanges:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 400)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    val (perBucket, _) = VersionedTable.bucketSkew(spark, a)
    assert(perBucket.values.sum == 400L)
  }

  test("updateWhere preserves the claim, even when the assignment rewrites the bucket key") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 500, "a"), a, "id", 4)
    VersionedTable.commitBucketed(rows(0 until 500, "b"), b, "id", 4)
    // shift a slice of keys by 1000: the updated rows must re-hash to
    // their NEW buckets for the claim to stay truthful
    val (_, updated) = VersionedTable.updateWhere(
      spark, a, col("id") < 100L, Map("id" -> (col("id") + lit(1000L))))
    assert(updated == 100L)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "updateWhere must keep the bucketing claim")
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a)
        .join(VersionedTable.table(spark, b), "id")
      assert(shuffles(joined) == 0,
        s"post-update co-bucketed join must plan with zero exchanges:\n${joined.queryExecution.executedPlan}")
      // keys 0..99 moved to 1000..1099 (no match in b); 100..499 still match
      assert(joined.count() == 400)
      assert(VersionedTable.read(spark, a).count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    val (perBucket, _) = VersionedTable.bucketSkew(spark, a)
    assert(perBucket.values.sum == 500L)
  }

  test("delete-everything on a claimed table keeps the table readable and claimed") {
    val a = fresh()
    VersionedTable.commitBucketed(rows(0 until 50, "a"), a, "id", 4)
    val (_, deleted) = VersionedTable.deleteWhere(spark, a, lit(true))
    assert(deleted == 50L)
    assert(VersionedTable.read(spark, a).count() == 0)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "the empty seed is bucket-suffixed, so the claim holds")
    // and a fresh bucketed append keeps working against the kept layout
    VersionedTable.commitBucketed(rows(0 until 10, "z"), a, "id", 4)
    assert(VersionedTable.read(spark, a).count() == 10)
  }

  test("mergeInto and replaceWhere preserve the claim; a key-widening merge drops it") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 400, "a"), a, "id", 4)
    VersionedTable.commitBucketed(rows(0 until 400, "b"), b, "id", 4)
    // CDC upsert: 50 updates + 50 inserts — THE routine fact-table write
    val src = rows(350 until 450, "upd")
    val res = VersionedTable.merge(spark, a, src, Seq("id"))
    assert(res.matchedRows == 50L, res.toString)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "mergeInto must keep the bucketing claim")
    // replaceWhere a slice
    VersionedTable.replaceWhere(
      spark, a, col("id") < 10L, rows(0 until 10, "repl"))
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "replaceWhere must keep the bucketing claim")
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a).select("id", "v")
        .join(VersionedTable.table(spark, b).select(col("id"), col("v").as("vb")), "id")
      assert(shuffles(joined) == 0,
        s"post-merge/replace co-bucketed join must plan with zero exchanges:\n" +
          joined.queryExecution.executedPlan)
      // 0..399 existing, 400..449 inserted; b holds 0..399 → 400 matches
      assert(joined.count() == 400)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    assert(VersionedTable.bucketSkew(spark, a)._1.values.sum == 450L)
    // a merge whose source WIDENS the key type must drop the claim:
    // murmur3(int) != murmur3(long), the kept files' layout no longer
    // matches the claimed partitioning
    val c = fresh()
    VersionedTable.commitBucketed(
      spark.range(100).select(col("id").cast("int").as("k"), col("id").as("v")),
      c, "k", 4)
    VersionedTable.merge(
      spark, c, spark.range(90, 110).select(col("id").as("k"), (col("id") * 2).as("v")),
      Seq("k"))
    assert(VersionedTable.bucketing(spark, c).isEmpty,
      "a key-widening merge must drop the claim")
    assert(VersionedTable.read(spark, c).count() == 110)
  }

  test("a non-key schema-widening merge keeps the claim; old bucket files null-fill") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 200, "a"), a, "id", 4)
    VersionedTable.commitBucketed(rows(0 until 200, "b"), b, "id", 4)
    // source carries an EXTRA column: the widen touches the schema but
    // not the key's type, so the claim holds and pre-merge bucket files
    // read the new column as null
    val src = (180L until 220L).map(i => (i, s"upd_$i", i * 10.0))
      .toDF("id", "v", "score")
    VersionedTable.merge(spark, a, src, Seq("id"))
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "a non-key widen must keep the claim")
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ta = VersionedTable.table(spark, a)
      assert(ta.columns.contains("score"))
      val joined = ta.join(VersionedTable.table(spark, b).select(
        col("id"), col("v").as("vb")), "id")
      assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 200)
      // null-fill on untouched files, real values on merged rows
      assert(ta.filter(col("score").isNotNull).count() == 40)
      assert(ta.filter(col("id") < 180L && col("score").isNotNull).count() == 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
  }

  test("metadata-only commits carry the claim; key-touching schema changes drop it") {
    val a = fresh()
    VersionedTable.commitBucketed(
      rows(0 until 200, "a").withColumn("note", lit("x")), a, "id", 4)
    // constraint add/drop, ANALYZE, ADD COLUMN, non-key DROP/RETYPE: the
    // file set is untouched, so the shuffle-free layout must survive
    VersionedTable.addCheck(spark, a, "pos_id", "id >= 0")
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)), "addCheck")
    VersionedTable.dropCheck(spark, a, "pos_id")
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)), "dropCheck")
    VersionedTable.analyzeStats(spark, a, Seq("id"))
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)), "analyzeStats")
    VersionedTable.analyzeBlooms(spark, a, Seq("id"))
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)), "analyzeBlooms")
    VersionedTable.addColumn(spark, a, "extra",
      org.apache.spark.sql.types.LongType)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)), "addColumn")
    VersionedTable.dropColumn(spark, a, "note")
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)), "non-key dropColumn")
    // the claimed read still joins exchange-free after the whole chain
    val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 200, "b"), b, "id", 4)
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a).select("id", "v")
        .join(VersionedTable.table(spark, b).select(col("id"), col("v").as("vb")), "id")
      assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 200)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    // RETYPING THE KEY drops the claim: murmur3 hashes int and long
    // differently, so carrying it would claim a partitioning the files
    // were never written under — a correctness cliff, not an optimization
    val c = fresh()
    VersionedTable.commitBucketed(
      spark.range(100).select(col("id").cast("int").as("k"), col("id").as("v")),
      c, "k", 4)
    VersionedTable.widenColumn(spark, c, "k", org.apache.spark.sql.types.LongType)
    assert(VersionedTable.bucketing(spark, c).isEmpty,
      "retyping the bucket key must drop the claim")
    assert(VersionedTable.read(spark, c).count() == 100)
  }

  test("DESCRIBE BUCKETS reports the per-bucket distribution; ZORDER on a claim refuses") {
    val a = fresh()
    VersionedTable.commitBucketed(rows(0 until 400, "a"), a, "id", 4)
    val rows4 = spark.sql(s"DESCRIBE BUCKETS `$a`").orderBy("bucket").collect()
    assert(rows4.length == 4)
    assert(rows4.map(_.getLong(1)).sum == 400L)
    assert(rows4.forall(r => r.getString(2) == "id" && r.getInt(3) == 4))
    assert(rows4.forall(_.getDouble(4) > 0.0))
    // unbucketed table refuses with a pointer to DESCRIBE DETAIL
    val plain = fresh()
    VersionedTable.commitAppend(rows(0 until 10, "p"), plain)
    val e = intercept[Exception](spark.sql(s"DESCRIBE BUCKETS `$plain`").collect())
    assert(e.getMessage.contains("no bucketing claim"), e.getMessage)
    // an explicit Z-ORDER on the claimed table refuses rather than
    // silently hash-bucketing (the layouts are exclusive); plain
    // compaction still works and keeps the claim
    val ez = intercept[IllegalArgumentException](
      VersionedTable.compact(spark, a, 1000L, zOrder = true))
    assert(ez.getMessage.contains("hash-bucketed"), ez.getMessage)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)))
  }

  test("bucketed micro-batches keep landing after mid-stream maintenance") {
    // the continuous-ingest lifecycle: batch 0 → deleteWhere → batch 1 →
    // compact → batch 2. requireBucketLayout validates each append
    // against the CURRENT claim, so maintenance preserving the claim is
    // exactly what keeps the stream alive without a re-cluster.
    val a = fresh()
    assert(VersionedTable.commitBucketedBatch(
      rows(0 until 100, "b0"), a, "id", 4, "w1", 0L).isDefined)
    VersionedTable.deleteWhere(spark, a, col("id") < 10L)
    assert(VersionedTable.commitBucketedBatch(
      rows(100 until 200, "b1"), a, "id", 4, "w1", 1L).isDefined,
      "a bucketed append after a claim-preserving delete must land")
    VersionedTable.compact(spark, a, targetRowsPerFile = 100000L)
    assert(VersionedTable.commitBucketedBatch(
      rows(200 until 300, "b2"), a, "id", 4, "w1", 2L).isDefined,
      "a bucketed append after a claim-preserving compact must land")
    // replay stays idempotent across the maintenance commits
    assert(VersionedTable.commitBucketedBatch(
      rows(200 until 300, "b2"), a, "id", 4, "w1", 2L).isEmpty,
      "replayed batch must be refused by the txn map")
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)))
    assert(VersionedTable.read(spark, a).count() == 290)
    assert(VersionedTable.bucketSkew(spark, a)._1.values.sum == 290L)
  }

  test("RESTORE to a claimed version restores its claim") {
    val a = fresh()
    VersionedTable.commitBucketed(rows(0 until 100, "a"), a, "id", 4) // v1 claimed
    VersionedTable.commitAppend(rows(100 until 120, "p"), a) // v2 drops it
    assert(VersionedTable.bucketing(spark, a).isEmpty)
    VersionedTable.restore(spark, a, 1L) // v3 = v1's exact file set
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "the restored HEAD is the claimed version's file set — claim restored")
    assert(VersionedTable.read(spark, a).count() == 100)
  }

  test("CREATE-first bucketed table: bucketSkew and countRows stay metadata-only") {
    val a = fresh()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    VersionedTable.create(spark, a, schema, Some(("id", 4)))
    // the seed file's zero count is recorded at create (ADVICE r13): the
    // skew probe must not error on a CREATE-first table
    val (empty, ratio) = VersionedTable.bucketSkew(spark, a)
    assert(empty.values.sum == 0L && ratio == 0.0)
    VersionedTable.commitBucketed(rows(0 until 100, "a"), a, "id", 4)
    val (perBucket, _) = VersionedTable.bucketSkew(spark, a)
    assert(perBucket.values.sum == 100L)
    assert(VersionedTable.countRows(spark, a) == 100L)
  }

  test("a NARROWER-key merge keeps the claim and buckets the upserts correctly") {
    // claimed key type long; the CDC source arrives with an INT key.
    // mergeWiden keeps long, the claim guard passes — so the staged
    // upserts MUST cast to long before the bucketed repartition
    // (murmur3 hashes int and long differently; without the cast the
    // rows land in the wrong buckets and the co-bucketed join silently
    // loses them while the scan still reports HashPartitioning).
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 200, "a"), a, "id", 4)
    VersionedTable.commitBucketed(rows(0 until 300, "b"), b, "id", 4)
    val src = spark.range(180, 260).select(
      col("id").cast("int").as("id"), concat(lit("upd_"), col("id")).as("v"))
    val res = VersionedTable.merge(spark, a, src, Seq("id"))
    assert(res.matchedRows == 20L, res.toString)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "a narrower source key conforms to the claimed type — claim must hold")
    assert(VersionedTable.tableSchema(spark, a).apply("id").dataType ==
      org.apache.spark.sql.types.LongType, "logical key type must stay long")
    // replaceWhere with the same narrow-keyed shape
    VersionedTable.replaceWhere(spark, a, col("id") < 5L,
      spark.range(0, 5).select(col("id").cast("int").as("id"), lit("repl").as("v")))
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)))
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a).select("id", "v")
        .join(VersionedTable.table(spark, b).select(col("id"), col("v").as("vb")), "id")
      assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
      // a holds 0..259, b holds 0..299 → every key must meet its partner
      assert(joined.count() == 260)
      // the upserted AND replaced slices specifically — the rows that land
      // in the wrong buckets when the narrow key is hashed raw
      assert(joined.filter(col("id") >= 180L).count() == 80)
      assert(joined.filter(col("v") === "repl").count() == 5)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    assert(VersionedTable.bucketSkew(spark, a)._1.values.sum == 260L)
  }

  test("a merge source MISSING the bucket key null-fills it instead of crashing") {
    // merge keys need not include the bucket key: a source that lacks the
    // key column entirely passes the claim guard (mergeWiden keeps the
    // prior type) and must stage with a null-filled key — one
    // deterministic bucket — not crash in the bucketed writer.
    val a = fresh()
    val base = spark.range(100).select(
      col("id"), concat(lit("c"), col("id")).as("code"), lit("old").as("v"))
    VersionedTable.commitBucketed(base, a, "id", 4)
    val src = Seq(("c5", "new"), ("cX", "ins")).toDF("code", "v")
    val res = VersionedTable.merge(spark, a, src, Seq("code"))
    assert(res.matchedRows == 1L, res.toString)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)),
      "absent key = additive-evolution null, not a claim drop")
    val t = VersionedTable.table(spark, a)
    assert(t.count() == 101)
    assert(t.filter(col("id").isNull).count() == 2,
      "replaced + inserted rows carry the null-filled bucket key")
    assert(VersionedTable.bucketSkew(spark, a)._1.values.sum == 101L)
  }

  test("compact with recorded stats zero-defaults empty staged buckets under a claim") {
    // every row hashes to ONE bucket, so compaction's bucketed re-stage
    // writes empty part files for the other three; with stats columns
    // recorded, rangesOf's grouped scan never sees them — they must still
    // get 0-counts or bucketSkew/DESCRIBE BUCKETS break the 'bucketed
    // commits always record' invariant.
    val a = fresh()
    val one = (0 until 30).map(i => (7L, s"x$i")).toDF("id", "v")
    VersionedTable.commitBucketed(one, a, "id", 4)
    VersionedTable.commitBucketed(one, a, "id", 4)
    VersionedTable.analyzeStats(spark, a, Seq("id"))
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)))
    val (_, merged) = VersionedTable.compact(spark, a, targetRowsPerFile = 1000L)
    assert(merged >= 2, s"expected the small bucket files to repack, got $merged")
    val (perBucket, _) = VersionedTable.bucketSkew(spark, a)
    assert(perBucket.values.sum == 60L)
    assert(VersionedTable.read(spark, a).count() == 60)
  }

  private def rows2(ids: Range, p: String) =
    ids.map(i => (i.toLong % 50, (i % 7).toLong, s"${p}_$i")).toDF("cust", "day", "v")

  test("composite bucket keys: co-bucketed join on the FULL key plans zero exchanges") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows2(0 until 1000, "a"), a, Seq("cust", "day"), 8)
    VersionedTable.commitBucketed(rows2(0 until 1000, "b"), b, Seq("cust", "day"), 8)
    assert(VersionedTable.bucketing(spark, a).contains(("cust,day", 8)))
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a).as("a")
        .join(VersionedTable.table(spark, b).as("b"), Seq("cust", "day"))
        .select(col("cust"), col("day"), col("a.v").as("va"), col("b.v").as("vb"))
      assert(shuffles(joined) == 0,
        s"composite co-bucketed join must plan exchange-free:\n${joined.queryExecution.executedPlan}")
      // every (cust, day) cell: |a-cell| * |b-cell| pairs; compare against
      // the plain-join oracle on the same frames
      val expected = rows2(0 until 1000, "a").as("a")
        .join(rows2(0 until 1000, "b").as("b"), Seq("cust", "day")).count()
      assert(joined.count() == expected)
      // aggregation on the FULL key also skips its exchange
      val agg = VersionedTable.table(spark, a).groupBy("cust", "day").agg(count(lit(1)))
      assert(shuffles(agg) == 0, "groupBy on the composite key must not exchange")
      // a join on a PARTIAL key must still shuffle (tuple hash tells you
      // nothing about single-column placement)
      val partial = VersionedTable.table(spark, a).select("cust", "v")
        .join(VersionedTable.table(spark, b).select(col("cust"), col("v").as("vb")), "cust")
      assert(shuffles(partial) > 0, "partial-key join must exchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
  }

  test("composite claim survives the maintenance lifecycle; widening ANY key drops it") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows2(0 until 600, "a"), a, Seq("cust", "day"), 4)
    VersionedTable.commitBucketed(rows2(0 until 600, "b"), b, Seq("cust", "day"), 4)
    VersionedTable.deleteWhere(spark, a, col("v") === "a_5")
    assert(VersionedTable.bucketing(spark, a).contains(("cust,day", 4)), "deleteWhere")
    VersionedTable.updateWhere(spark, a, col("v") === "a_7",
      Map("v" -> lit("a_7x")))
    assert(VersionedTable.bucketing(spark, a).contains(("cust,day", 4)), "updateWhere")
    VersionedTable.compact(spark, a, targetRowsPerFile = 1000000L)
    assert(VersionedTable.bucketing(spark, a).contains(("cust,day", 4)), "compact")
    // merge keyed on the composite key (CDC upsert)
    val src = Seq((3L, 2L, "m1"), (60L, 1L, "m2")).toDF("cust", "day", "v")
    VersionedTable.merge(spark, a, src, Seq("cust", "day", "v"))
    assert(VersionedTable.bucketing(spark, a).contains(("cust,day", 4)), "merge")
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a)
        .join(VersionedTable.table(spark, b).select(
          col("cust"), col("day"), col("v").as("vb")), Seq("cust", "day"))
      assert(shuffles(joined) == 0,
        s"post-maintenance composite join must stay exchange-free:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    // widening ONE of the keys re-hashes the tuple: claim must drop
    val c = fresh()
    VersionedTable.commitBucketed(
      spark.range(100).select(
        col("id").cast("int").as("cust"), (col("id") % 7).as("day"),
        col("id").cast("string").as("v")),
      c, Seq("cust", "day"), 4)
    VersionedTable.merge(spark, c,
      spark.range(90, 110).select(
        col("id").as("cust"), (col("id") % 7).as("day"),
        col("id").cast("string").as("v")),
      Seq("cust", "day"))
    assert(VersionedTable.bucketing(spark, c).isEmpty,
      "widening one composite key must drop the claim")
    // and retyping one key via DDL drops it too
    val e = fresh()
    VersionedTable.commitBucketed(
      spark.range(100).select(
        col("id").cast("int").as("cust"), (col("id") % 7).cast("int").as("day"),
        col("id").cast("string").as("v")),
      e, Seq("cust", "day"), 4)
    VersionedTable.widenColumn(spark, e, "day", org.apache.spark.sql.types.LongType)
    assert(VersionedTable.bucketing(spark, e).isEmpty,
      "retyping one composite key must drop the claim")
  }

  test("composite point lookup: readWhereAll cuts to one bucket only when EVERY key is pinned") {
    val a = fresh()
    VersionedTable.commitBucketed(rows2(0 until 1000, "a"), a, Seq("cust", "day"), 8)
    val q = VersionedTable.readWhereAll(spark, a,
      Map("cust" -> ((3L, 3L)), "day" -> ((3L, 3L))))
    q.collect()
    def opened(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p match {
          case ad: AdaptiveSparkPlanExec => walk(ad.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => qs +: walk(qs.plan)
          case other => other +: other.children.flatMap(walk)
        }
      walk(df.queryExecution.executedPlan)
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .flatMap(_.inputRDD.partitions.toSeq.flatMap[Int] {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(f => "_(\\d+)\\.".r
              .findFirstMatchIn(new java.net.URI(f.urlEncodedPath).getPath.split("/").last)
              .get.group(1).toInt)
          case _ => Seq.empty
        })
    }
    import org.apache.spark.sql.types.LongType
    val want = VersionedTable.bucketIdOfTuple(Seq((3L, LongType), (3L, LongType)), 8)
    val got = opened(q)
    assert(got.nonEmpty && got.forall(_ == want), s"full pin must cut to bucket $want: $got")
    // pinning only ONE key of the tuple must NOT cut
    val partial = VersionedTable.readWhereAll(spark, a, Map("cust" -> ((3L, 3L))))
    assert(opened(partial).toSet.size > 1, "partial pin must not bucket-cut")
  }

  test("rebucket restores the claim by rewriting ONLY the unclaimed tail") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 400, "a"), a, "id", 4)
    VersionedTable.commitBucketed(rows(0 until 400, "b"), b, "id", 4)
    val claimedEraFiles = VersionedTable.read(spark, a).inputFiles.toSet
    // the fat-fingered plain append that drops the claim forever
    VersionedTable.commitAppend(rows(400 until 450, "p"), a)
    assert(VersionedTable.bucketing(spark, a).isEmpty)
    val res = VersionedTable.rebucket(spark, a)
    assert(res.key == "id" && res.nBuckets == 4)
    assert(res.filesCarried == 4, res.toString)
    assert(res.filesRewritten >= 1, res.toString)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)))
    // carry-by-reference: every claimed-era file is STILL the same
    // physical file in the restored manifest (cost ∝ tail, not table)
    val nowFiles = VersionedTable.read(spark, a).inputFiles.toSet
    assert(claimedEraFiles.subsetOf(nowFiles),
      s"claimed-era files must carry by reference; missing: ${claimedEraFiles -- nowFiles}")
    assert(VersionedTable.read(spark, a).count() == 450)
    // the co-bucketed join is exchange-free again and row-exact
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a).select("id", "v")
        .join(VersionedTable.table(spark, b).select(col("id"), col("v").as("vb")), "id")
      assert(shuffles(joined) == 0,
        s"post-rebucket join must plan exchange-free:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 400)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    assert(VersionedTable.bucketSkew(spark, a)._1.values.sum == 450L)
    // already claimed: a no-op that reports full carry
    val again = VersionedTable.rebucket(spark, a)
    assert(again.filesRewritten == 0 && again.filesCarried > 0)
    // appends keep working against the restored layout
    VersionedTable.commitBucketed(rows(450 until 460, "z"), a, "id", 4)
    assert(VersionedTable.read(spark, a).count() == 460)
  }

  test("rebucket rewrites DV'd claimed-era files and refuses honest-impossibility cases") {
    // DVs added during the unclaimed era point INTO claimed-era files: a
    // claimed table carries no deletion vectors, so those files must
    // rewrite (tombstones materialize out), while untouched ones carry
    val a = fresh()
    VersionedTable.commitBucketed(rows(0 until 400, "a"), a, "id", 4)
    VersionedTable.commitAppend(rows(400 until 420, "p"), a)
    VersionedTable.deleteWhereDV(spark, a, col("id") === 7L)
    val res = VersionedTable.rebucket(spark, a)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 4)))
    assert(res.filesCarried < 4, s"the DV'd bucket file must rewrite: $res")
    assert(VersionedTable.read(spark, a).count() == 419)
    assert(VersionedTable.table(spark, a).filter(col("id") === 7L).count() == 0)
    assert(VersionedTable.bucketSkew(spark, a)._1.values.sum == 419L)
    // no claimed ancestor: refuse by name
    val plain = fresh()
    VersionedTable.commitAppend(rows(0 until 10, "x"), plain)
    val e1 = intercept[IllegalArgumentException](VersionedTable.rebucket(spark, plain))
    assert(e1.getMessage.contains("no retained version"), e1.getMessage)
    // key retyped since the claimed era: the old layout is unrecoverable
    val c = fresh()
    VersionedTable.commitBucketed(
      spark.range(100).select(col("id").cast("int").as("k"), col("id").as("v")),
      c, "k", 4)
    VersionedTable.widenColumn(spark, c, "k", org.apache.spark.sql.types.LongType)
    assert(VersionedTable.bucketing(spark, c).isEmpty)
    val e2 = intercept[IllegalArgumentException](VersionedTable.rebucket(spark, c))
    assert(e2.getMessage.contains("changed type"), e2.getMessage)
  }

  test("composite CLUSTERED BY DDL and OPTIMIZE REBUCKET drive the new layout ops from SQL") {
    spark.conf.set("spark.sql.catalog.vtc2", classOf[graft.sources.VtCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("vt_ddl2").toString
    spark.conf.set("spark.sql.catalog.vtc2.warehouse", wh)
    spark.sql(
      "CREATE TABLE vtc2.fact (cust BIGINT, day BIGINT, v STRING) " +
        "CLUSTERED BY (cust, day) INTO 4 BUCKETS")
    assert(VersionedTable.bucketing(spark, s"$wh/fact").contains(("cust,day", 4)),
      "composite DDL claim must exist from version 1")
    spark.sql(
      "INSERT INTO vtc2.fact SELECT id % 50, id % 7, concat('r_', id) FROM range(400)")
    assert(VersionedTable.bucketing(spark, s"$wh/fact").contains(("cust,day", 4)),
      "SQL INSERT must honor the composite layout")
    assert(VersionedTable.read(spark, s"$wh/fact").count() == 400)
    // DESCRIBE BUCKETS reports the comma-joined key
    val db = spark.sql(s"DESCRIBE BUCKETS vtc2.`$wh/fact`").collect()
    assert(db.length == 4 && db.forall(_.getAs[String]("bucket_key") == "cust,day"))
    // drop the claim with a plain append, then recover it from SQL
    VersionedTable.commitAppend(
      spark.range(400, 450).select(
        (col("id") % 50).as("cust"), (col("id") % 7).as("day"),
        concat(lit("p_"), col("id")).as("v")),
      s"$wh/fact")
    assert(VersionedTable.bucketing(spark, s"$wh/fact").isEmpty)
    val r = spark.sql(s"OPTIMIZE vtc2.`$wh/fact` REBUCKET").collect()(0)
    assert(r.getAs[String]("bucket_key") == "cust,day")
    assert(r.getAs[Int]("n_buckets") == 4)
    // 5 = the INSERT's 4 bucket files + the CREATE's bucket-suffixed
    // empty seed, all claimed-era
    assert(r.getAs[Int]("files_carried") == 5, r.toString)
    assert(r.getAs[Int]("files_rewritten") >= 1, r.toString)
    assert(VersionedTable.bucketing(spark, s"$wh/fact").contains(("cust,day", 4)))
    assert(VersionedTable.read(spark, s"$wh/fact").count() == 450)
  }

  test("streaming bucketed sink on a COMPOSITE key keeps the table join-ready") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = fresh()
    val ms = MemoryStream[(Long, Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("bk_ckpt2").toString
    val q = graft.streaming.EventStreams.startBucketedVersionedSink(
      ms.toDS().toDF("cust", "day", "v"), path, Seq("cust", "day"), 4, "bkw2", ckpt)
    try {
      ms.addData((0 until 200).map(i => (i.toLong % 50, (i % 7).toLong, s"a_$i")): _*)
      q.processAllAvailable()
      ms.addData((200 until 300).map(i => (i.toLong % 50, (i % 7).toLong, s"b_$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.bucketing(spark, path).contains(("cust,day", 4)),
      "composite claim must survive micro-batches")
    assert(VersionedTable.read(spark, path).count() == 300)
    val other = fresh()
    VersionedTable.commitBucketed(rows2(0 until 600, "o"), other, Seq("cust", "day"), 4)
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, path)
        .join(VersionedTable.table(spark, other).select(
          col("cust"), col("day"), col("v").as("vo")), Seq("cust", "day"))
      assert(shuffles(joined) == 0,
        s"stream-built composite table must join exchange-free:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
  }
}
