package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Bucket-count evolution ([[VersionedTable.rebucketInto]], VERDICT r15
  * item 5). Pins the refinement contract that makes power-of-two growth
  * LOCAL: every child file of old bucket b holds only rows whose
  * mod-newN bucket is ≡ b (mod n); untouched versions keep file
  * identity (time travel intact); the grown claim joins a newN-bucketed
  * partner with zero exchanges; non-power targets fall back to a full
  * rewrite and say so. */
class BucketEvolveSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("vt_evolve").toString + "/tbl"

  private def rows(ids: Range, p: String) =
    ids.map(i => (i.toLong, s"${p}_$i")).toDF("id", "v")

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: walk(q.plan)
        case other => other +: other.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("doubling is a local refinement: children carry only their parent's rows; old versions keep file identity") {
    val path = fresh()
    VersionedTable.commitBucketed(rows(0 until 1200, "x"), path, "id", 4)
    val v1 = VersionedTable.versions(spark, path).last
    val v1Files = VersionedTable.filesOf(spark, path, Some(v1))
    val before = VersionedTable.read(spark, path).orderBy("id").collect().toSeq

    val r = VersionedTable.rebucketInto(spark, path, 8)
    assert(r.local, "power-of-two growth must take the local path")
    assert(VersionedTable.bucketing(spark, path).contains(("id", 8)))
    // data identical
    assert(VersionedTable.read(spark, path).orderBy("id").collect().toSeq == before)
    // refinement: every new file's suffix c holds ONLY rows hashing to c
    // under mod 8, and c mod 4 is the parent bucket
    val suffix = "_(\\d+)\\.".r
    val newFiles = VersionedTable.filesOf(spark, path, None)
    assert(newFiles.forall(f => !v1Files.contains(f)), "growth rewrites every file")
    newFiles.foreach { f =>
      val c = suffix.findFirstMatchIn(f).get.group(1).toInt
      assert(c < 8)
      val bad = spark.read.parquet(s"$path/data/$f")
        .withColumn("__b", pmod(hash(col("id")), lit(8)))
        .filter(col("__b") =!= c).count()
      assert(bad == 0, s"file $f (child $c) holds rows of another bucket")
    }
    // every parent spawned at most its two children, nothing else: the
    // set of child ids mod 4 equals the set of parent ids that had rows
    val childParents = newFiles.map(f => suffix.findFirstMatchIn(f).get.group(1).toInt % 4).toSet
    assert(childParents.subsetOf((0 until 4).toSet))
    // untouched versions: v1's manifest still lists the SAME files and
    // they are still readable (file-identity time travel)
    assert(VersionedTable.filesOf(spark, path, Some(v1)) == v1Files)
    assert(VersionedTable.read(spark, path, Some(v1)).orderBy("id").collect().toSeq == before)
    // two more doublings compose: 8 -> 32 in one local call
    val r2 = VersionedTable.rebucketInto(spark, path, 32)
    assert(r2.local && VersionedTable.bucketing(spark, path).contains(("id", 32)))
    assert(VersionedTable.read(spark, path).orderBy("id").collect().toSeq == before)
  }

  test("the grown claim joins a matching partner with zero exchanges") {
    val a = fresh(); val b = fresh()
    VersionedTable.commitBucketed(rows(0 until 1000, "a"), a, "id", 4)
    VersionedTable.commitBucketed(rows(500 until 1500, "b"), b, "id", 8)
    assert(VersionedTable.rebucketInto(spark, a, 8).local)
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = VersionedTable.table(spark, a).as("a")
        .join(VersionedTable.table(spark, b).as("b"), "id")
        .select(col("id"), col("a.v").as("va"), col("b.v").as("vb"))
      assert(shuffles(joined) == 0,
        s"grown co-bucketed join must plan with zero exchanges:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
  }

  test("split width (buckets per union job) is conf-tunable; fallback under the conf still states local = false") {
    val path = fresh()
    VersionedTable.commitBucketed(rows(0 until 900, "x"), path, "id", 4)
    val before = VersionedTable.read(spark, path).orderBy("id").collect().toSeq
    val was = spark.conf.getOption("spark.graft.rebucket.splitPoolWidth")
    spark.conf.set("spark.graft.rebucket.splitPoolWidth", "2")
    try {
      val r = VersionedTable.rebucketInto(spark, path, 8)
      assert(r.local && r.filesWritten == 8, r.toString)
      assert(VersionedTable.read(spark, path).orderBy("id").collect().toSeq == before)
      // the conf narrows the per-job bucket group, never the honesty: a
      // non-power target under the same conf still rewrites and says so
      val r2 = VersionedTable.rebucketInto(spark, path, 6)
      assert(!r2.local && VersionedTable.bucketing(spark, path).contains(("id", 6)))
      assert(VersionedTable.read(spark, path).orderBy("id").collect().toSeq == before)
      spark.conf.set("spark.graft.rebucket.splitPoolWidth", "0")
      val e = intercept[IllegalArgumentException](
        VersionedTable.rebucketInto(spark, path, 12))
      assert(e.getMessage.contains("splitPoolWidth"), e.getMessage)
    } finally {
      was.fold(spark.conf.unset("spark.graft.rebucket.splitPoolWidth"))(
        spark.conf.set("spark.graft.rebucket.splitPoolWidth", _))
    }
  }

  test("non-power target falls back to a full rewrite, says so, and still claims") {
    val path = fresh()
    VersionedTable.commitBucketed(rows(0 until 600, "x"), path, "id", 4)
    val before = VersionedTable.read(spark, path).orderBy("id").collect().toSeq
    val r = VersionedTable.rebucketInto(spark, path, 6)
    assert(!r.local, "4 -> 6 cannot be a local refinement")
    assert(VersionedTable.bucketing(spark, path).contains(("id", 6)))
    assert(VersionedTable.read(spark, path).orderBy("id").collect().toSeq == before)
    // shrink also rewrites
    val r2 = VersionedTable.rebucketInto(spark, path, 3)
    assert(!r2.local && VersionedTable.bucketing(spark, path).contains(("id", 3)))
    assert(VersionedTable.read(spark, path).orderBy("id").collect().toSeq == before)
  }

  test("composite keys grow locally too; unclaimed tables refuse") {
    val path = fresh()
    val df = (0 until 800).map(i => (i.toLong, (i % 37).toLong, s"r$i"))
      .toDF("a", "b", "v")
    VersionedTable.commitBucketed(df, path, Seq("a", "b"), 4)
    val before = VersionedTable.read(spark, path).orderBy("a").collect().toSeq
    val r = VersionedTable.rebucketInto(spark, path, 8)
    assert(r.local && VersionedTable.bucketing(spark, path).contains(("a,b", 8)))
    assert(VersionedTable.read(spark, path).orderBy("a").collect().toSeq == before)
    val suffix = "_(\\d+)\\.".r
    VersionedTable.filesOf(spark, path, None).foreach { f =>
      val c = suffix.findFirstMatchIn(f).get.group(1).toInt
      val bad = spark.read.parquet(s"$path/data/$f")
        .withColumn("__b", pmod(hash(col("a"), col("b")), lit(8)))
        .filter(col("__b") =!= c).count()
      assert(bad == 0, s"composite child $c holds foreign rows")
    }
    val plain = fresh()
    VersionedTable.commitAppend(rows(0 until 10, "p"), plain)
    val e = intercept[IllegalArgumentException](
      VersionedTable.rebucketInto(spark, plain, 8))
    assert(e.getMessage.contains("no bucketing claim"), e.getMessage)
  }

  test("OPTIMIZE ... REBUCKET INTO drives the evolution from SQL") {
    spark.conf.set("spark.sql.catalog.vtev", classOf[graft.sources.VtCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("vt_ev_sql").toString
    spark.conf.set("spark.sql.catalog.vtev.warehouse", wh)
    VersionedTable.commitBucketed(rows(0 until 400, "s"), s"$wh/fact", "id", 4)
    val r = spark.sql(s"OPTIMIZE vtev.`$wh/fact` REBUCKET INTO 8 BUCKETS").collect()(0)
    assert(r.getAs[Int]("n_buckets") == 8 && r.getAs[Boolean]("local"), r.toString)
    assert(VersionedTable.bucketing(spark, s"$wh/fact").contains(("id", 8)))
    assert(VersionedTable.read(spark, s"$wh/fact").count() == 400)
    val r2 = spark.sql(s"OPTIMIZE vtev.`$wh/fact` REBUCKET INTO 12 BUCKETS").collect()(0)
    assert(r2.getAs[Int]("n_buckets") == 12 && !r2.getAs[Boolean]("local"), r2.toString)
  }
}
