package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Funnel

/** Ordered-funnel fold ([[Funnel]]): the one-pass accumulator checked
  * against an independent in-memory min-chain on constructed edge cases
  * (out-of-order arrival, timestamp ties, repeats, partial funnels) and
  * against randomized event logs. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private val stages = Seq("a", "b", "c")

  private def t(us: Long) = new Timestamp(us / 1000) // ms precision is fine here

  /** Independent reference: sequential min-chain with strict `>`. */
  private def reference(evs: Seq[(Long, String)]): Int = {
    var last = Long.MinValue
    var reached = 0
    while (reached < stages.length) {
      val nxt = evs.collect {
        case (us, tp) if tp == stages(reached) && us > last => us
      }
      if (nxt.isEmpty) return reached
      last = nxt.min
      reached += 1
    }
    reached
  }

  private def run(evs: Seq[(Long, Long, String)]): Map[Long, Int] =
    Funnel.userProgress(
      evs.map { case (u, us, tp) => (u, t(us), tp) }.toDF("user_id", "ts", "event_type"),
      "user_id", "event_type", "ts", stages)
      .select("user", "reached").as[(Long, Int)].collect().toMap

  test("stage order is enforced: b-before-a does not count") {
    val got = run(Seq((1L, 1000000L, "b"), (1L, 2000000L, "a"), (1L, 3000000L, "c")))
    assert(got(1L) == 1) // reached a; the early b doesn't count, no b after a
  }

  test("simultaneous events never advance two stages (strict >)") {
    val got = run(Seq((1L, 1000000L, "a"), (1L, 1000000L, "b"), (1L, 2000000L, "b")))
    assert(got(1L) == 2) // b at the same instant as a is ignored; later b counts
  }

  test("full funnel with noise events and repeats") {
    val got = run(Seq(
      (1L, 1000000L, "a"), (1L, 1500000L, "a"), (1L, 2000000L, "x"),
      (1L, 3000000L, "b"), (1L, 4000000L, "c"),
      (2L, 1000000L, "c"), (2L, 2000000L, "b")))
    assert(got(1L) == 3)
    assert(got(2L) == 0)
  }

  test("conversion times are the min-chain reach times") {
    val p = Funnel.userProgress(
      Seq((1L, t(1000000L), "a"), (1L, t(5000000L), "b"), (1L, t(3000000L), "b"),
        (1L, t(9000000L), "c")).toDF("user_id", "ts", "event_type"),
      "user_id", "event_type", "ts", stages)
      .select("first_us", "last_us").as[(Long, Long)].collect().head
    assert(p == ((1000000L, 9000000L))) // b reached at 3s (earliest after a), c at 9s
  }

  test("randomized logs match the independent min-chain per user") {
    val rnd = new scala.util.Random(42)
    val types = Seq("a", "b", "c", "x")
    val evs = (0 until 2000).map { i =>
      (rnd.nextInt(40).toLong, (rnd.nextInt(500) + 1) * 1000000L,
        types(rnd.nextInt(types.length)))
    }
    val got = run(evs.map { case (u, us, tp) => (u, us, tp) })
    val byUser = evs.groupBy(_._1)
    byUser.foreach { case (u, es) =>
      val want = reference(es.map { case (_, us, tp) => (us, tp) })
      assert(got.getOrElse(u, 0) == want, s"user $u")
    }
  }

  test("stageCounts emits zero rows for unreached stages and is cumulative") {
    val df = Seq((1L, t(1000000L), "a"), (2L, t(1000000L), "a"),
      (2L, t(2000000L), "b")).toDF("user_id", "ts", "event_type")
    val got = Funnel.stageCounts(df, "user_id", "event_type", "ts", stages)
      .orderBy("stage_idx")
      .select("stage_idx", "stage", "n_users").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", 2L), (2, "b", 1L), (3, "c", 0L)))
  }
}
