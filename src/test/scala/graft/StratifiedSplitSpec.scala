package graft

import org.apache.spark.sql.functions._

import graft.ops.StratifiedSplit

/** Contract of [[StratifiedSplit]]: per-stratum counts are EXACTLY the
  * floor boundaries, membership is a pure function of (id, stratum
  * population) — invariant under layout and bucket width — and tiny
  * strata degrade gracefully.
  */
class StratifiedSplitSpec extends SparkSuite {

  private def counts(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    df.groupBy("lang", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("per-stratum counts hit the exact floor boundaries") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = counts(StratifiedSplit.assign(docs, "doc_id", "lang", 0.8, 0.1))
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val train = math.floor(0.8 * n).toLong
      val valN = math.floor((0.8 + 0.1) * n).toLong - train
      assert(got.getOrElse((lang, "train"), 0L) == train, s"$lang train")
      assert(got.getOrElse((lang, "val"), 0L) == valN, s"$lang val")
      assert(got.getOrElse((lang, "test"), 0L) == n - train - valN, s"$lang test")
    }
  }

  test("membership is invariant under repartitioning AND bucket width") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def assign(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      StratifiedSplit.assign(df, "doc_id", "lang", 0.8, 0.1)
        .select("doc_id", "split")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val base = assign(docs)
    assert(assign(docs.repartition(7)) == base)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(assign(docs) == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("weight boundaries: train share misses the token target by < one doc's weight") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("toks", size(split(col("text"), " ")).cast("long"))
    val assigned = graft.ops.StratifiedSplit
      .assignByWeight(docs, "doc_id", "lang", "toks", 0.8, 0.1)
    val perLang = assigned.groupBy("lang", "split")
      .agg(sum("toks").as("w"), max("toks").as("maxw"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val totals = perLang.groupBy(_._1._1).view.mapValues(_.values.map(_._1).sum).toMap
    totals.foreach { case (lang, w) =>
      val train = perLang.getOrElse((lang, "train"), (0L, 0L))._1
      val maxDoc = perLang.collect { case ((l, _), (_, m)) if l == lang => m }.max
      // the boundary row is the only slack either side of the target
      assert(math.abs(train - 0.8 * w) <= maxDoc.toDouble,
        s"$lang: train=$train target=${0.8 * w} maxDoc=$maxDoc")
    }
    // membership invariant under layout, like the count variant
    val a = assigned.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val b = graft.ops.StratifiedSplit
      .assignByWeight(docs.repartition(5), "doc_id", "lang", "toks", 0.8, 0.1)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("plan shape: the offset table broadcasts; data windows key on (stratum, bucket)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = graft.ops.StratifiedSplit.assign(docs, "doc_id", "lang", 0.8, 0.1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"offset join not broadcast:\n$plan")
    assert(plan.contains("hashpartitioning(lang"), s"data window not stratum-bucketed:\n$plan")
  }

  test("tiny strata: n=1 goes to test, n=2 splits train/test at 50/50") {
    import spark.implicits._
    val df = Seq(
      (1L, "solo"), (2L, "duo"), (3L, "duo")).toDF("doc_id", "lang")
    val got = StratifiedSplit.assign(df, "doc_id", "lang", 0.5, 0.0)
      .select("doc_id", "lang", "split")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // n=1: floor(0.5) = 0 -> no train row; the single doc is test
    assert(got(1L) == "test")
    // n=2: exactly one train, one test
    val duo = Seq(got(2L), got(3L)).sorted
    assert(duo == Seq("test", "train"))
  }
}
