package graft

import org.apache.spark.sql.functions._

import graft.ops.{Decontaminate, Dedup, KAnonymity}

/** Independent checks for the release/selection operators behind
  * q225-q228: k-anonymity suppression, source-priority dedup tie-breaks,
  * data-sized containment, and the cluster-safe-split leakage guarantee
  * (the oracle gate re-checks the query outputs against DuckDB; here we
  * pin the op-level contracts on hand-built corpora).
  */
class ReleaseOpsSpec extends SparkSuite {

  test("KAnonymity.audit counts classes; suppress drops exactly the small ones") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 10), ("a", 1, 11), ("a", 1, 12),
      ("a", 2, 13),
      ("b", 1, 14), ("b", 1, 15))
      .toDF("seg", "band", "payload")
    val audit = KAnonymity.audit(df, Seq("seg", "band"), 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(audit(("a", 1)) == (3L, true))
    assert(audit(("a", 2)) == (1L, false))
    assert(audit(("b", 1)) == (2L, true))
    val kept = KAnonymity.suppress(df, Seq("seg", "band"), 2)
      .select("payload").as[Int].collect().sorted
    assert(kept.toSeq == Seq(10, 11, 12, 14, 15)) // the (a,2) singleton is gone
    // k = 1 suppresses nothing
    assert(KAnonymity.suppress(df, Seq("seg", "band"), 1).count() == 6L)
  }

  test("lDiversity flags the homogeneity attack k-anonymity misses") {
    import spark.implicits._
    // class (a,1) is 3-anonymous but every member shares nation 7:
    // membership alone discloses the sensitive value
    val df = Seq(
      ("a", 1, 7), ("a", 1, 7), ("a", 1, 7),
      ("b", 1, 1), ("b", 1, 2), ("b", 1, 3))
      .toDF("seg", "band", "nation")
    assert(KAnonymity.audit(df, Seq("seg", "band"), 3)
      .collect().forall(_.getBoolean(3)), "both classes are k-anonymous")
    val ld = KAnonymity.lDiversity(df, Seq("seg", "band"), "nation", 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(ld("a") == ((3L, 1L, false)), "homogeneous class must fail")
    assert(ld("b") == ((3L, 3L, true)))
  }

  test("exactBySourcePriority keeps the preferred-source copy, with total tie-breaks") {
    import spark.implicits._
    val df = Seq(
      (1L, "crawl_b", "same text"),
      (2L, "curated", "same text"),
      (3L, "crawl_a", "same text"),
      (4L, "crawl_a", "other text"),
      (5L, "crawl_b", "third text"),
      (6L, "crawl_b", "third text"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.exactBySourcePriority(df, "text", "doc_id", "source", Seq("curated"))
      .select("keep_id", "keep_source", "dup_cnt")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    // "same text": curated copy (id 2) wins over lower id 1.
    // "third text": no listed source -> (source, id) tie-break keeps id 5.
    assert(got.toSeq == Seq((2L, "curated", 3L), (4L, "crawl_a", 1L), (5L, "crawl_b", 2L)))
    // an EARLIER priority entry beats a later one even at a higher id
    val two = Dedup.exactBySourcePriority(
      df.filter(col("text") === "same text"),
      "text", "doc_id", "source", Seq("crawl_a", "curated"))
      .select("keep_id").as[Long].collect()
    assert(two.toSeq == Seq(3L))
  }

  test("containmentAgainst matches hand-counted 3-gram hits; no broadcast of the reference") {
    import spark.implicits._
    val target = Seq(
      (1L, "a b c d"),      // grams: abc, bcd -> both in ref
      (2L, "x y z w"),      // grams: xyz (in ref via doc 11), yzw -> 1 of 2
      (3L, "a b c x y z"),  // abc, bcx, cxy, xyz -> 2 of 4
      (4L, "q r"))          // < 3 tokens -> dropped
      .toDF("doc_id", "text")
    val ref = Seq(
      (10L, "a b c d e"),   // abc bcd cde
      (11L, "p x y z"))     // pxy xyz
      .toDF("doc_id", "text")
    val got = Decontaminate.containmentAgainst(target, ref, "text", "doc_id", 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(1L -> (2L, 2L), 2L -> (2L, 1L), 3L -> (4L, 2L)))
    // the reference side must stay a shuffle join, never a broadcast —
    // that is this op's reason to exist next to Decontaminate.overlap
    val plan = Decontaminate.containmentAgainst(target, ref, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), s"reference was broadcast:\n$plan")
  }

  test("cluster-safe split never separates near-dup components (sf0.001)") {
    val rows = SparkEntry.queries("q225_cluster_safe_split")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("test", "train", "val"))
    val nDocs = rows.map(_.getLong(1)).sum
    val nClusters = rows.map(_.getLong(2)).sum
    // clusters partition the corpus across splits: totals add up, and
    // every cluster lands in exactly one split (sum of per-split distinct
    // clusters == global distinct clusters, which is < docs iff some
    // component has >= 2 members)
    assert(nDocs == spark.read.parquet(s"$sf0001/documents.parquet").count())
    assert(nClusters < nDocs, "fixture should contain at least one near-dup component")
  }
}
