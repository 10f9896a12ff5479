package graft

import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** DSIR importance resampling ([[Dsir]]): model semantics against an
  * in-memory reference, selection invariants, and the scale-shape
  * contract (ratio table bounded by k, broadcast scoring join). */
class DsirSpec extends SparkSuite {

  import spark.implicits._

  private val raw = Seq(
    (1L, "aa bb cc"),
    (2L, "aa aa aa"),
    (3L, "xx yy zz ww"),
    (4L, "bb cc"),
    (5L, "xx xx")).toDF("id", "text")

  private val target = Seq(
    (100L, "aa bb"),
    (101L, "aa cc aa")).toDF("id", "text")

  private val K = 16

  /** Reference model: same md5₄₈ bucket, add-1 smoothing, plain Scala. */
  private def refBucket(tok: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"dsir-v1:$tok".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    java.lang.Long.parseLong(hex, 16) % K
  }

  private def refLogWeights: Map[Long, Double] = {
    val rawToks = Map(
      1L -> Seq("aa", "bb", "cc"), 2L -> Seq("aa", "aa", "aa"),
      3L -> Seq("xx", "yy", "zz", "ww"), 4L -> Seq("bb", "cc"),
      5L -> Seq("xx", "xx"))
    val tgtToks = Seq("aa", "bb", "aa", "cc", "aa")
    val rCnt = rawToks.values.flatten.toSeq.groupBy(refBucket).view.mapValues(_.size).toMap
    val tCnt = tgtToks.groupBy(refBucket).view.mapValues(_.size).toMap
    val rTot = rawToks.values.map(_.size).sum
    val tTot = tgtToks.size
    def ratio(b: Long): Double =
      math.log((tCnt.getOrElse(b, 0) + 1.0) / (tTot + K)) -
        math.log((rCnt.getOrElse(b, 0) + 1.0) / (rTot + K))
    rawToks.map { case (id, toks) => id -> toks.map(t => ratio(refBucket(t))).sum }
  }

  test("log weights match the in-memory reference model") {
    val got = Dsir.logWeights(raw, target, "text", "id", k = K)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ref = refLogWeights
    assert(got.keySet == ref.keySet)
    for ((id, (nToks, logW)) <- got) {
      assert(math.abs(logW - ref(id)) < 1e-9, s"doc $id")
      assert(nToks == raw.filter($"id" === id).select(size(split($"text", " ")))
        .as[Int].head().toLong)
    }
  }

  test("target-like docs outscore target-unlike docs") {
    val w = Dsir.logWeights(raw, target, "text", "id", k = K)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs 1/2/4 share all tokens with the target; docs 3/5 share none
    assert(Seq(1L, 2L, 4L).map(w).min > Seq(3L, 5L).map(w).max)
  }

  test("ratio table is bounded by k and defined for every bucket hit") {
    val lr = Dsir.logRatios(raw, target, "text", K, "dsir-v1").collect()
    assert(lr.length <= K)
    assert(lr.map(_.getLong(0)).distinct.length == lr.length)
  }

  test("selectTopN returns exactly n rows with dense ranks and no dupes") {
    val w = Dsir.logWeights(raw, target, "text", "id", k = K)
    val sel = Dsir.selectTopN(w, "id", 3).collect()
    assert(sel.length == 3)
    assert(sel.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(sel.map(_.getLong(0)).distinct.length == 3)
  }

  test("selection is deterministic across runs and monotone in the seed draw") {
    val w = Dsir.logWeights(raw, target, "text", "id", k = K)
    val a = Dsir.selectTopN(w, "id", 2).collect().map(_.getLong(0)).toSet
    val b = Dsir.selectTopN(w, "id", 2).collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("scoring join broadcasts the ratio table (no data-sized shuffle join)") {
    val plan = Dsir.logWeights(raw, target, "text", "id", k = K)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
