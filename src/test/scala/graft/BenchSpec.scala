package graft

import graft.queries.QueryDef

/** Bench integrity guards:
  *
  *  - (VERDICT r1 item 2) a crashing headline query must FAIL the bench
  *    run — recorded as "error" with ok=false — never be swallowed into
  *    a ~0 s time that improves the total;
  *  - (VERDICT r13 item 1) the bench emits TWO lines — detail first,
  *    compact LAST — so a bounded TAIL capture of stdout always keeps the
  *    round-over-round gate (`"metric":"shared_total"` + per-query
  *    medians of the frozen shared set). In round 13 the plan-metrics map
  *    pushed the timings out of the recorded artifact; the compact line
  *    carries no plan map, and its size is asserted here against the
  *    driver's 2,000-char tail window at the full shared-set width.
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

  test("all-green bench reports ok=true and numeric times on both lines") {
    val (detail, compact, ok) = Bench.run(spark, sf0001, Seq(good))
    assert(ok)
    for (line <- Seq(detail, compact)) {
      assert(line.contains("\"ok\":true"), line)
      assert(!line.contains("\"error\""), line)
      assert(line.contains("\"headline_n\":1"), line)
    }
    // the COMPACT line is the gate line: shared_total leads and it is
    // the LAST printed (main prints detail then compact)
    assert(compact.startsWith("{\"metric\":\"shared_total\""), compact)
    assert(detail.startsWith("{\"metric\":\"bench_detail\""), detail)
    // deterministic plan metrics ride the DETAIL line only: a regression
    // in a later round is attributable (files/shuffle moved vs pure wall
    // noise) without bloating the tail-captured gate line
    assert(detail.contains("\"plan\":{\"bench_good\":{\"files\":"), detail)
    assert(detail.contains("\"shuffle_bytes\":"), detail)
    assert(!compact.contains("\"plan\""), compact)
    // VERDICT r14 item 1: the detail line persists to a file so the full
    // plan map survives outside the bounded stdout tail
    val f = java.nio.file.Files.createTempFile("bench_detail", ".json")
    Bench.persistDetail(detail, f.toString)
    val back = new String(java.nio.file.Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(back == detail + "\n")
    // an unwritable path must NOT throw (stdout already carried the line)
    Bench.persistDetail(detail, "/nonexistent-dir/nope/bench_detail.json")
  }

  test("a broken query records error and fails the bench") {
    val (detail, compact, ok) = Bench.run(spark, sf0001, Seq(good, broken))
    assert(!ok)
    for (line <- Seq(detail, compact)) {
      assert(line.contains("\"bench_broken\":\"error\""), line)
      assert(line.contains("\"ok\":false"), line)
    }
    // the good query still reports a real time on the detail line
    assert(detail.contains("\"bench_good\":"), detail)
    assert(!detail.contains("\"bench_good\":\"error\""), detail)
    // the broken query has no plan entry; the good one still does
    assert(!detail.contains("\"plan\":{\"bench_broken\""), detail)
    assert(detail.contains("\"bench_good\":{\"files\":"), detail)
  }

  test("compact line fits the driver's 2,000-char tail at full shared-set width") {
    // Upper-bound simulation: every shared-set query present with a
    // worst-case-width median (double with full precision), plus the
    // fixed fields. Rather than run 16 real queries, budget-check the
    // format arithmetic: name + median entry per shared query.
    val perQuery = Bench.SharedSet.toSeq.map(n => s""""$n":0.123456789012345""")
    val simulated =
      s"""{"metric":"shared_total","value":12.345678901234567,"unit":"sec",""" +
        s""""shared_n":16,"total":99.99999999999999,"headline_n":60,""" +
        s""""queries":${perQuery.mkString("{", ",", "}")},"errors":{},""" +
        s""""ok":true,"sf":"/root/testdata/sf0.1"}"""
    assert(simulated.length < 1900, s"compact line ${simulated.length} chars")
  }

  test("observed metrics surface in the detail plan map") {
    // a query carrying a Dataset.observe must land its counters under
    // "observed" — this is how q211's candidate-pair cardinality stays
    // visible in the bench artifact (VERDICT r13 item 8)
    val observed = QueryDef(
      "bench_observed",
      (s, d) =>
        graft.core.Tables.region(s, d)
          .observe("probe", org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows_seen")),
      None)
    val (detail, _, ok) = Bench.run(spark, sf0001, Seq(observed))
    assert(ok)
    assert(detail.contains("\"observed\":{\"probe.rows_seen\":"), detail)
  }
}
