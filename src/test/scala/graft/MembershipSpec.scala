package graft

import org.apache.spark.sql.functions._

import graft.ops.Membership

/** The large-list membership path (VERDICT r2 item 6): a 10k-entry word
  * list must run as a broadcast hash join — no per-row linear scans — and
  * agree with the array-path semantics the TrainPrep queries use for tiny
  * lists.
  */
class MembershipSpec extends SparkSuite {
  import spark.implicits._

  private val stopWords = (0 until 10000).map(i => s"w$i")

  test("10k-word stoplist prunes via broadcast join, order preserved, no linear scan") {
    val stop = stopWords.toDF("w")
    val docs = Seq(
      (1L, Seq("w1", "keep1", "w2", "keep2", "keep1")),
      (2L, Seq("w3", "w4")), // fully stopped -> empty kept, row survives
      (3L, Seq("keep3")))
      .toDF("doc_id", "toks")
    val pruned = Membership.pruneTokens(docs, "doc_id", col("toks"), stop)
    val got = pruned.orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(got == Seq(
      (1L, Seq("keep1", "keep2", "keep1")), // duplicates + positions kept
      (2L, Seq.empty[String]),
      (3L, Seq("keep3"))))
    val plan = pruned.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), s"stoplist must broadcast-join:\n$plan")
    assert(!plan.contains("array_contains"), s"no per-row linear membership scan:\n$plan")
  }

  test("encodeTokens maps ids in token order with OOV as 0") {
    val vocab = Seq(("alpha", 1), ("beta", 2)).toDF("w", "id")
    val docs = Seq(
      (1L, Seq("beta", "zzz", "alpha", "beta")),
      (2L, Seq("zzz")))
      .toDF("doc_id", "toks")
    val got = graft.ops.Membership
      .encodeTokens(docs, "doc_id", col("toks"), vocab)
      .orderBy("doc_id")
      .select("doc_id", "n_tok", "n_oov", "ids")
      .as[(Long, Long, Long, Seq[Int])].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 1L, Seq(2, 0, 1, 2)), // order + duplicate ids preserved
      (2L, 1L, 1L, Seq(0))))
  }

  test("encodeTokens counts OOV correctly under a ZERO-BASED vocabulary") {
    // r3/r4 latent defect: n_oov used to count the post-coalesce sentinel
    // (_id === 0), so a vocab that legitimately assigns id 0 miscounted.
    // OOV must come from the join miss, not the sentinel value.
    val vocab = Seq(("alpha", 0), ("beta", 1)).toDF("w", "id")
    val docs = Seq(
      (1L, Seq("alpha", "zzz", "beta", "alpha")), // 1 OOV, two real id-0 tokens
      (2L, Seq("alpha")))                         // 0 OOV despite id 0
      .toDF("doc_id", "toks")
    val got = Membership.encodeTokens(docs, "doc_id", col("toks"), vocab)
      .orderBy("doc_id")
      .select("doc_id", "n_tok", "n_oov", "ids")
      .as[(Long, Long, Long, Seq[Int])].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 1L, Seq(0, 0, 1, 0)), // ids ambiguous by contract; counts exact
      (2L, 1L, 0L, Seq(0))))
  }

  test("encodeTokensBroadcast equals the join form on normal AND zero-based vocabularies") {
    val rng = new scala.util.Random(23)
    val vocabWords = (1 to 200).map(i => s"w$i")
    val docs = (1L to 100L).map { id =>
      (id, Seq.fill(5 + rng.nextInt(40))(
        if (rng.nextInt(10) == 0) s"oov${rng.nextInt(50)}" else vocabWords(rng.nextInt(200))))
    }.toDF("doc_id", "toks")
    for (base <- Seq(1, 0)) { // standard and zero-based vocabularies
      val vocab = vocabWords.zipWithIndex.map { case (w, i) => (w, i + base) }.toDF("w", "id")
      val joinForm = Membership.encodeTokens(docs, "doc_id", col("toks"), vocab)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Seq[Int])].collect().toSeq
      val mapForm = Membership.encodeTokensBroadcast(docs, "doc_id", col("toks"), vocab)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Seq[Int])].collect().toSeq
      assert(mapForm == joinForm, s"paths diverged for base=$base")
    }
    // zero-token docs produce no row in either form
    val empty = Seq((9L, Seq.empty[String])).toDF("doc_id", "toks")
    val vocab1 = vocabWords.zipWithIndex.map { case (w, i) => (w, i + 1) }.toDF("w", "id")
    assert(Membership.encodeTokensBroadcast(empty, "doc_id", col("toks"), vocab1).count() == 0)
    // the guard refuses an over-budget vocabulary
    val err = intercept[IllegalArgumentException] {
      Membership.encodeTokensBroadcast(docs, "doc_id", col("toks"), vocab1, maxEntries = 10)
    }
    assert(err.getMessage.contains("join form"))
  }

  test("mixing byWeight repeats rows and drops weight<=0") {
    val df = Seq(("a", 3), ("b", 1), ("c", 0), ("d", -2)).toDF("k", "w")
    val got = graft.ops.Mixing.byWeight(df, col("w"))
      .groupBy("k").agg(count(lit(1)).as("n"), max("epoch").as("me"))
      .orderBy("k").as[(String, Long, Int)].collect().toSeq
    assert(got == Seq(("a", 3L, 3), ("b", 1L, 1))) // c and d vanish
  }

  test("mixing byFractionalWeight: reproducible, row-stable, binomially bounded") {
    val n = 10000
    val df = (1L to n.toLong).toDF("doc_id").withColumn("w", lit(2.3))
    def mix() = graft.ops.Mixing.byFractionalWeight(df, col("w"), col("doc_id"))
    // reproducible: two runs produce the identical multiset of (id, epoch)
    val a = mix().select("doc_id", "epoch").orderBy("doc_id", "epoch")
      .as[(Long, Int)].collect().toSeq
    val b = mix().select("doc_id", "epoch").orderBy("doc_id", "epoch")
      .as[(Long, Int)].collect().toSeq
    assert(a == b)
    // every row appears 2 or 3 times; total within binomial bounds of
    // n*2.3 (sigma = sqrt(n*0.3*0.7) ≈ 46; allow 6 sigma ≈ 275)
    val perRow = a.groupBy(_._1).view.mapValues(_.size)
    assert(perRow.values.forall(c => c == 2 || c == 3))
    assert(perRow.size == n)
    assert(math.abs(a.size - 2.3 * n) < 6 * math.sqrt(n * 0.3 * 0.7))
    // a different seed flips some per-row decisions (the coin is seeded,
    // not constant)
    val other = graft.ops.Mixing.byFractionalWeight(df, col("w"), col("doc_id"), seed = 7L)
      .select("doc_id", "epoch").orderBy("doc_id", "epoch").as[(Long, Int)].collect().toSeq
    assert(other != a && math.abs(other.size - 2.3 * n) < 6 * math.sqrt(n * 0.3 * 0.7))
    // weights <= 0 still drop; pure-integer weights stay exact
    val exact = graft.ops.Mixing.byFractionalWeight(
      Seq(("a", 3.0), ("b", 0.0)).toDF("k", "w"), col("w"), col("k"))
      .groupBy("k").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toSeq
    assert(exact == Seq(("a", 3L)))
  }

  test("temperatureWeights: alpha=1 is proportional, alpha<1 flattens, budget splits exactly") {
    val df = Seq.fill(90)(("big", 10)).++(Seq.fill(10)(("small", 10)))
      .toDF("source", "ntok")
    def w(alpha: Double) = graft.ops.Mixing
      .temperatureWeights(df, "source", col("ntok"), alpha, budgetTokens = 1000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val prop = w(1.0)
    assert(math.abs(prop("big")._2 - 0.9) < 1e-12)
    assert(math.abs(prop("small")._2 - 0.1) < 1e-12)
    // alpha=1, budget = total tokens -> exactly one epoch everywhere
    val one = graft.ops.Mixing
      .temperatureWeights(df, "source", col("ntok"), 1.0, budgetTokens = 1000L)
      .collect().map(_.getDouble(3))
    assert(one.forall(e => math.abs(e - 1.0) < 1e-12))
    // alpha=0.5 flattens: small source's share rises, big's falls
    val flat = w(0.5)
    assert(flat("small")._2 > prop("small")._2 && flat("big")._2 < prop("big")._2)
    // probabilities always sum to 1
    assert(math.abs(flat.values.map(_._2).sum - 1.0) < 1e-12)
    // the flattened mix gives the small source MORE epochs than the big one
    assert(flat("small")._3 > flat("big")._3)
  }

  test("oovCounts against a 10k vocab matches direct per-row counting") {
    val vocab = (0 until 10000).map(i => s"v$i").toDF("w")
    val docs = Seq(
      (1L, Seq("v1", "x", "v2", "y", "v1")),
      (2L, Seq("x")))
      .toDF("doc_id", "toks")
    val got = Membership.oovCounts(docs, "doc_id", col("toks"), vocab)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 2L), (2L, 1L, 1L)))
  }
}
