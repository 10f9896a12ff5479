package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Incremental LSH ingestion must be invisible in the results: the union
  * of pairs reported across a sequence of increments equals the one-shot
  * pipeline over the full corpus, and the existing corpus is never
  * re-signed (the ledger only ever receives appends of the new batch).
  */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  test("increment-reported pairs union to the one-shot full-corpus result") {
    val base = Files.createTempDirectory("dedup_ledger").toString
    val ledger = Dedup.DedupLedger(s"$base/bands", s"$base/sketches")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val batchA = docs.filter(col("doc_id") % 2 === 0)
    val batchB = docs.filter(col("doc_id") % 2 === 1)

    val pairsA = Dedup.ingestIncrement(batchA, ledger, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    val pairsB = Dedup.ingestIncrement(batchB, ledger, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    // A-internal pairs come from the first ingest, everything touching B
    // from the second; nothing is reported twice.
    assert(pairsA.intersect(pairsB).isEmpty, "pair reported by two increments")
    assert(pairsA.forall { case (a, b, _) => a % 2 == 0 && b % 2 == 0 })
    assert(pairsB.forall { case (a, b, _) => a % 2 == 1 || b % 2 == 1 })

    val oneShot = Dedup.minhashNearDupPairs(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    assert(pairsA.union(pairsB) == oneShot,
      s"incremental != one-shot: missing=${oneShot -- pairsA -- pairsB} " +
        s"extra=${(pairsA ++ pairsB) -- oneShot}")

    // The ledger accumulated exactly one sketch row per doc (appends only,
    // nothing re-signed).
    val sketches = spark.read.parquet(ledger.sketches)
    assert(sketches.count() == sketches.select("doc_id").distinct().count())
  }

  test("a corrupt ledger fails loudly instead of silently reading as empty") {
    val base = Files.createTempDirectory("dedup_ledger3").toString
    val ledger = Dedup.DedupLedger(s"$base/bands", s"$base/sketches")
    // a present-but-unreadable ledger: garbage bytes where parquet should be
    Files.createDirectories(java.nio.file.Paths.get(ledger.bands))
    Files.write(
      java.nio.file.Paths.get(ledger.bands, "part-00000.parquet"),
      "not a parquet file".getBytes)
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    // silently treating this as a first increment would under-report
    // duplicates forever — it must throw, not return an empty result
    intercept[Exception] {
      Dedup.ingestIncrement(docs, ledger, "text", "doc_id").collect()
    }
  }

  test("an increment of exact re-sends pairs against the ledger, not itself twice") {
    val base = Files.createTempDirectory("dedup_ledger2").toString
    val ledger = Dedup.DedupLedger(s"$base/bands", s"$base/sketches")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val first = Dedup.ingestIncrement(docs, ledger, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    assert(first.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    // Second increment: a new exact copy pairs with BOTH ledger copies.
    val more = Seq((4L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val second = Dedup.ingestIncrement(more, ledger, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    assert(second == Set((1L, 4L, 1.0), (2L, 4L, 1.0)),
      s"unexpected second-increment pairs: $second")
  }
}
