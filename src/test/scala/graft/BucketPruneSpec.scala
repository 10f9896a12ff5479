package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Bucket pruning on bucket-key point lookups (VERDICT r14 item 3): a
  * claimed table knows key → murmur3 bucket, so `key = lit` must open
  * ONE bucket's files, not all of them — the standard point-lookup win
  * on a 100 TB bucketed fact. Two surfaces: [[VersionedTable.table]]
  * prunes natively (Spark's FileSourceStrategy derives a bucket set
  * from the equality filter over the attached BucketSpec) and
  * [[VersionedTable.readWhereAll]] applies the same cut on its explicit
  * file list. The scan's `numFiles` METRIC is set before the native
  * cut, so these specs read the executed FilePartitions — what the
  * tasks actually open. */
class BucketPruneSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("vt_prune").toString + "/tbl"

  /** Files the executed scan ACTUALLY schedules (post bucket-cut). */
  private def openedFiles(df: DataFrame): Seq[String] = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
        case other => other +: other.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .flatMap(_.inputRDD.partitions.toSeq.flatMap[String] {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.map(f => new java.net.URI(f.urlEncodedPath).getPath.split("/").last)
        case _ => Seq.empty
      })
  }

  private def bucketOf(name: String): Int =
    "_(\\d+)\\.".r.findFirstMatchIn(name).get.group(1).toInt

  test("table(): key = lit on a claimed table opens exactly one bucket's files") {
    val a = fresh()
    val rows = (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "v")
    // two bucketed appends → 2 files per bucket: the cut must keep BOTH
    // files of the key's bucket and nothing else
    VersionedTable.commitBucketed(rows.filter(col("id") < 1000L), a, "id", 8)
    VersionedTable.commitBucketed(rows.filter(col("id") >= 1000L), a, "id", 8)
    val q = VersionedTable.table(spark, a).filter(col("id") === 42L)
    assert(q.count() == 1)
    val opened = openedFiles(q)
    val expected = VersionedTable.bucketIdOf(
      42L, org.apache.spark.sql.types.LongType, 8)
    assert(opened.nonEmpty && opened.forall(f => bucketOf(f) == expected),
      s"point lookup must only open bucket $expected's files, opened: $opened")
    assert(opened.size == 2, s"both commits' files of the bucket: $opened")
    // IN-list prunes to the union of the member buckets
    val inQ = VersionedTable.table(spark, a).filter(col("id").isin(42L, 999L, 1500L))
    assert(inQ.count() == 3)
    val inBuckets = openedFiles(inQ).map(bucketOf).toSet
    val wantBuckets = Set(42L, 999L, 1500L).map(k =>
      VersionedTable.bucketIdOf(k, org.apache.spark.sql.types.LongType, 8))
    assert(inBuckets == wantBuckets, s"IN-list buckets $inBuckets vs $wantBuckets")
    // positive control: the unclaimed twin opens every file
    val b = fresh()
    VersionedTable.commitAppend(rows.filter(col("id") < 1000L), b)
    VersionedTable.commitAppend(rows.filter(col("id") >= 1000L), b)
    val control = VersionedTable.table(spark, b).filter(col("id") === 42L)
    assert(control.count() == 1)
    assert(openedFiles(control).size ==
      VersionedTable.read(spark, b).inputFiles.length,
      "unclaimed control must open all files")
  }

  test("table(): pruning survives maintenance and respects the claimed key type") {
    val a = fresh()
    VersionedTable.commitBucketed(
      (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v"), a, "id", 8)
    VersionedTable.deleteWhere(spark, a, col("v") === "v7")
    VersionedTable.compact(spark, a, targetRowsPerFile = 1000000L)
    assert(VersionedTable.bucketing(spark, a).contains(("id", 8)))
    val q = VersionedTable.table(spark, a).filter(col("id") === 500L)
    assert(q.count() == 1)
    val opened = openedFiles(q)
    val expected = VersionedTable.bucketIdOf(500L, org.apache.spark.sql.types.LongType, 8)
    assert(opened.forall(f => bucketOf(f) == expected), opened.toString)
  }

  test("readWhereAll: a point predicate on the bucket key cuts to one bucket") {
    val a = fresh()
    val rows = (0L until 2000L).map(i => (i, i % 100, s"v$i")).toDF("id", "grp", "v")
    VersionedTable.commitBucketed(rows.filter(col("id") < 1000L), a, "id", 8)
    VersionedTable.commitBucketed(rows.filter(col("id") >= 1000L), a, "id", 8)
    VersionedTable.analyzeStats(spark, a, Seq("id"))
    val q = VersionedTable.readWhereAll(spark, a, Map("id" -> ((42L, 42L))))
    assert(q.count() == 1)
    val opened = openedFiles(q)
    val expected = VersionedTable.bucketIdOf(42L, org.apache.spark.sql.types.LongType, 8)
    assert(opened.nonEmpty && opened.forall(f => bucketOf(f) == expected),
      s"readWhereAll point lookup must cut to bucket $expected, opened: $opened")
    // a RANGE predicate must NOT bucket-cut (values span buckets)
    val r = VersionedTable.readWhereAll(spark, a, Map("id" -> ((40L, 45L))))
    assert(r.count() == 6)
    // an INT-claimed table hashes the literal at int, not long
    val c = fresh()
    VersionedTable.commitBucketed(
      spark.range(500).select(col("id").cast("int").as("k"), col("id").as("v")),
      c, "k", 8)
    val qc = VersionedTable.readWhereAll(spark, c, Map("k" -> ((42L, 42L))))
    assert(qc.count() == 1)
    val openedC = openedFiles(qc)
    val expectedInt = VersionedTable.bucketIdOf(
      42, org.apache.spark.sql.types.IntegerType, 8)
    assert(openedC.forall(f => bucketOf(f) == expectedInt),
      s"int key must hash at int: $openedC vs bucket $expectedInt")
  }

  /** Task-level input bytes of everything `f` executes — the only
    * honest probe through the catalog's V1 seam, where the inner
    * FileSourceScan's plan (and its metrics) are invisible to the outer
    * query. Waits for the async listener bus to drain by polling the
    * accumulator to stability. */
  private def inputBytes(f: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) acc.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var last = -1L; var i = 0
      while (acc.get != last && i < 50) { last = acc.get; Thread.sleep(100); i += 1 }
    } finally spark.sparkContext.removeSparkListener(l)
    acc.get
  }

  test("SQL surfaces: catalog point lookup prunes I/O through the V1 seam; a temp view keeps the join layout") {
    val a = fresh(); val b = fresh()
    // payload column inflates bytes so the 1/8 cut is unambiguous
    val rows = (0L until 4000L).map(i => (i, ("x" * 200) + i)).toDF("id", "v")
    VersionedTable.commitBucketed(rows, a, "id", 8)
    VersionedTable.commitBucketed(rows.select(col("id"), col("v").as("vb")), b, "id", 8)
    spark.conf.set("spark.sql.catalog.vtbp", classOf[graft.sources.VtCatalog].getName)
    val full = inputBytes {
      spark.sql(s"SELECT count(*) AS n, sum(length(v)) AS s FROM vtbp.`$a`").collect()
    }
    val point = inputBytes {
      val r = spark.sql(s"SELECT v FROM vtbp.`$a` WHERE id = 42").collect()
      assert(r.length == 1)
    }
    assert(point > 0 && point < full / 3,
      s"catalog point lookup must read ~1/8 of the bytes: point=$point full=$full")
    // the catalog join pays the V1 seam: partitioning does not cross an
    // RDD boundary, so the exchange is BACK (documented in VtCatalog) —
    // file pruning survives, the layout claim does not
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val seamJoin = spark.sql(
        s"SELECT count(*) AS n FROM vtbp.`$a` x JOIN vtbp.`$b` y ON x.id = y.id")
      assert(seamJoin.collect()(0).getAs[Long]("n") == 4000L)
      // the documented recipe for exchange-free SQL joins on claimed
      // tables: a temp view over table() keeps the BucketSpec scan
      VersionedTable.table(spark, a).createOrReplaceTempView("bp_view_a")
      VersionedTable.table(spark, b).createOrReplaceTempView("bp_view_b")
      val viewJoin = spark.sql(
        "SELECT bp_view_a.id, v, vb FROM bp_view_a JOIN bp_view_b " +
          "ON bp_view_a.id = bp_view_b.id")
      def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
          p match {
            case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(ad.executedPlan)
            case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => qs +: walk(qs.plan)
            case other => other +: other.children.flatMap(walk)
          }
        walk(df.queryExecution.executedPlan)
          .count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
      }
      assert(countShuffles(viewJoin) == 0,
        s"temp-view SQL join must keep the layout:\n${viewJoin.queryExecution.executedPlan}")
      assert(viewJoin.count() == 4000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
      spark.catalog.dropTempView("bp_view_a")
      spark.catalog.dropTempView("bp_view_b")
    }
  }
}
