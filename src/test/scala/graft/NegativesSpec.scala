package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Negatives

/** Negative-pair sampling ([[Negatives.negativePairs]]): structural
  * guarantees (k per anchor, never self, valid partner ids), determinism
  * under recomputation, and spread (the hash actually disperses). */
class NegativesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)

  test("k pairs per anchor, never self, partner ids come from the corpus") {
    val ids = docs.select(col("doc_id")).as[Long].collect().toSet
    val rows = Negatives.negativePairs(docs, "doc_id", 3)
      .as[(Long, Int, Long)].collect().toSeq
    assert(rows.length == ids.size * 3)
    assert(rows.forall { case (a, _, n) => a != n })
    assert(rows.forall { case (_, _, n) => ids.contains(n) })
    val perAnchor = rows.groupBy(_._1)
    assert(perAnchor.values.forall(_.map(_._2).sorted == Seq(0, 1, 2)))
  }

  test("deterministic: two runs produce the identical pair set") {
    def run() = Negatives.negativePairs(docs, "doc_id", 2)
      .as[(Long, Int, Long)].collect().toSet
    assert(run() == run())
  }

  test("different j draws different partners for most anchors (spread)") {
    val rows = Negatives.negativePairs(docs, "doc_id", 3)
      .as[(Long, Int, Long)].collect().toSeq
    val distinctPerAnchor = rows.groupBy(_._1).values.map(_.map(_._3).distinct.size)
    // all-equal partners for an anchor would mean the hash ignores j
    assert(distinctPerAnchor.count(_ >= 2).toDouble / distinctPerAnchor.size > 0.9)
    // and globally the partner pool should cover a large share of the corpus
    assert(rows.map(_._3).distinct.size > rows.map(_._1).distinct.size / 2)
  }

  test("seed changes the sample") {
    val a = Negatives.negativePairs(docs, "doc_id", 2).as[(Long, Int, Long)].collect().toSet
    val b = Negatives.negativePairs(docs, "doc_id", 2, seed = "neg-v2")
      .as[(Long, Int, Long)].collect().toSet
    assert(a != b)
  }

  test("rejects degenerate inputs") {
    intercept[IllegalArgumentException] {
      Negatives.negativePairs(docs, "doc_id", 0)
    }
  }
}
