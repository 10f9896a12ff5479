package graft

import graft.queries.QueryDef

/** Bench integrity guard (VERDICT r1 item 2): a crashing headline query
  * must FAIL the bench run — recorded as "error" with ok=false — never be
  * swallowed into a ~0 s time that improves the total.
  */
class BenchSpec extends SparkSuite {

  private val good = QueryDef(
    "bench_good",
    (s, d) => graft.core.Tables.region(s, d),
    None)

  private val broken = QueryDef(
    "bench_broken",
    (s, _) => s.read.parquet("/nonexistent/path/never.parquet"),
    None)

  test("all-green bench reports ok=true and numeric times") {
    val (line, ok) = Bench.run(spark, sf0001, Seq(good))
    assert(ok)
    assert(line.contains("\"ok\":true"), line)
    assert(!line.contains("\"error\""), line)
    // shared_total LEADS the JSON (the round-over-round-comparable
    // number); the growing full-set total rides behind with its size
    assert(line.startsWith("{\"metric\":\"shared_total\""), line)
    assert(line.contains("\"headline_n\":1"), line)
    // deterministic plan metrics ride beside the median: a regression in a
    // later round is attributable (files/shuffle moved vs pure wall noise)
    assert(line.contains("\"plan\":{\"bench_good\":{\"files\":"), line)
    assert(line.contains("\"shuffle_bytes\":"), line)
  }

  test("a broken query records error and fails the bench") {
    val (line, ok) = Bench.run(spark, sf0001, Seq(good, broken))
    assert(!ok)
    assert(line.contains("\"bench_broken\":\"error\""), line)
    assert(line.contains("\"ok\":false"), line)
    // the good query still reports a real time
    assert(line.contains("\"bench_good\":"), line)
    assert(!line.contains("\"bench_good\":\"error\""), line)
    // the broken query has no plan entry; the good one still does
    assert(!line.contains("\"plan\":{\"bench_broken\""), line)
    assert(line.contains("\"bench_good\":{\"files\":"), line)
  }
}
