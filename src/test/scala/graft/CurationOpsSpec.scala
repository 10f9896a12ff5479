package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.{Decontaminate, Mixing, Pseudonymize}

/** Round-11 curation additions: the Gopher top-n-gram signal, portable
  * fractional mixing, salted pseudonymization, and the per-probe semantic
  * leakage transpose — each pinned against hand-computed expectations. */
class CurationOpsSpec extends SparkSuite {
  import spark.implicits._

  test("topNgramFrac: hand-computed fractions, short-doc zero") {
    val df = Seq(
      (1L, "a b a b a c"), // top1: a×3/6; top2: 'a b'×2 of 5
      (2L, "x x x x"),     // top1: 4/4; top2: 'x x'×3 of 3
      (3L, "q"),           // single token: top1 = 1, top2 = 0 (too short)
      (4L, "a b c d e")    // all distinct: top1 1/5, top2 1/4
    ).toDF("doc_id", "text")
    val got = df.select(
      col("doc_id"),
      TextFunctions.topNgramFrac(col("text"), 1).as("t1"),
      TextFunctions.topNgramFrac(col("text"), 2).as("t2"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((0.5, 0.4)))
    assert(got(2L) == ((1.0, 1.0)))
    assert(got(3L) == ((1.0, 0.0)))
    assert(got(4L) == ((0.2, 0.25)))
  }

  test("portable fractional mixing: exact md5-coin copy counts, id-stable") {
    val df = (0L until 400L).toDF("id")
      .withColumn("w", when(col("id") < 200, 2.5).otherwise(0.5))
    val mixed = Mixing.byFractionalWeightPortable(df, col("w"), col("id"))
    val byId = mixed.groupBy("id").agg(count(lit(1)).as("n"), max("epoch").as("me"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // every id < 200 gets 2 or 3 copies; >= 200 gets 0 (absent) or 1
    byId.foreach { case (id, (n, me)) =>
      if (id < 200) assert(n == 2 || n == 3, s"id=$id n=$n")
      else assert(n == 1, s"id=$id n=$n")
      assert(me == n, "epochs are 1..n")
    }
    // fractional shares land near the remainders (md5-uniform, 6-sigma)
    val extra = byId.count { case (id, (n, _)) => id < 200 && n == 3 }
    assert(math.abs(extra - 100) < 6 * math.sqrt(200 * 0.25), s"extra=$extra")
    val kept = byId.count { case (id, _) => id >= 200 }
    assert(math.abs(kept - 100) < 6 * math.sqrt(200 * 0.25), s"kept=$kept")
    // re-run is identical (coin is a pure function of the id)
    val again = Mixing.byFractionalWeightPortable(df, col("w"), col("id"))
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == byId.map { case (k, (n, _)) => k -> n })
  }

  test("pseudonymize: deterministic, injective here, join-preserving, salt-sensitive") {
    val users = (1L to 500L).toDF("user_id")
    val p1 = Pseudonymize.table(users, "user_id", "saltA")
    val p2 = Pseudonymize.table(users, "user_id", "saltA")
    assert(p1.collect().map(_.getString(0)).toSeq == p2.collect().map(_.getString(0)).toSeq)
    assert(p1.distinct().count() == 500, "500 subjects -> 500 pseudonyms")
    // join equivalence: pseudonymizing both sides preserves the join result
    val orders = Seq((1L, 10.0), (2L, 20.0), (2L, 5.0), (999L, 1.0)).toDF("user_id", "v")
    val direct = users.join(orders, "user_id").agg(sum("v")).collect()(0).getDouble(0)
    val viaPseudo = Pseudonymize.table(users, "user_id", "saltA")
      .join(Pseudonymize.table(orders, "user_id", "saltA"), "user_id")
      .agg(sum("v")).collect()(0).getDouble(0)
    assert(direct == viaPseudo && direct == 35.0)
    // a rotated salt breaks linkage to the old release
    val rotated = Pseudonymize.table(users, "user_id", "saltB")
    assert(p1.join(rotated, "user_id").count() == 0)
  }

  test("semanticLeakage: planted cross-split near-dup found; transpose of semanticOverlap") {
    val train = Seq(
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0))).toDF("vec_id", "emb")
    val test = Seq(
      (10L, Array(0.999, 0.045, 0.0)), // leaks from train vec 1
      (11L, Array(0.0, 0.0, 1.0))      // orthogonal to all of train
    ).toDF("vec_id", "emb")
    val got = Decontaminate.semanticLeakage(train, test)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(10L) > 0.99 && got(11L) < 1e-9)
    // transpose equivalence: overlap(corpus=test, benchmark=train) grouped
    // per test id gives the same maxima
    val viaOverlap = Decontaminate.semanticOverlap(test, train)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == viaOverlap)
  }
}
