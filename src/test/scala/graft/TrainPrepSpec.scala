package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Decontaminate, GlobalRank}
import graft.queries.TrainPrep

/** Training-data-prep surface: decontamination overlap math on a toy
  * corpus, distributed prefix sum vs the single-window reference,
  * order-preserving boilerplate pruning, and fixture smoke for the q95-q98
  * registry entries.
  */
class TrainPrepSpec extends SparkSuite {

  test("decontaminate: exact overlap counts on a toy corpus") {
    import spark.implicits._
    val bench = Seq((0L, "a b c d")).toDF("doc_id", "text")
    // "a b c" hits, "b c d" hits, "c d x" misses, "d x y" misses
    val corpus = Seq((1L, "a b c d x y")).toDF("doc_id", "text")
    val got = Decontaminate.overlap(corpus, bench, "text", "doc_id", n = 3)
      .select("doc_id", "n_grams", "n_hit")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 4L, 2L)))
  }

  test("decontaminate: within-doc repeated n-grams count once (distinct semantics)") {
    import spark.implicits._
    val bench = Seq((0L, "a b c")).toDF("doc_id", "text")
    // tokens a b c z a b c -> 3-grams (a b c, b c z, c z a, z a b, a b c):
    // 4 DISTINCT grams, exactly 1 of them contaminated — the repeat of
    // "a b c" must not count twice (ADVICE r2 finding)
    val corpus = Seq((1L, "a b c z a b c")).toDF("doc_id", "text")
    val got = Decontaminate.overlap(corpus, bench, "text", "doc_id", n = 3)
      .select("doc_id", "n_grams", "n_hit")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 4L, 1L)))
  }

  test("decontaminate: docs shorter than n are dropped, duplicates flagged fully") {
    import spark.implicits._
    val bench = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = Decontaminate.overlap(corpus, bench, "text", "doc_id", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 2L, 2L)))
  }

  test("prefixSum matches single-window cumulative sum on documents") {
    val t = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val r = GlobalRank.prefixSum(t, col("n"), col("doc_id"), Nil)
      .select(col("doc_id"), col("_psum"))
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = t.select(
      col("doc_id"), coalesce(sum(col("n")).over(w), lit(0L)).as("_psum"))
    assert(r.except(expected).isEmpty && expected.except(r).isEmpty)
  }

  test("prefixSum survives heavy ties on the leading order column") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i % 3 * 1.0, i.toLong, (i % 7 + 1).toLong)).toDF("v", "id", "n")
    val r = GlobalRank.prefixSum(df, col("n"), col("v"), Seq(col("id")))
      .select(col("id"), col("_psum"))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.select(col("id"), coalesce(sum(col("n")).over(w), lit(0L)).as("_psum"))
    assert(r.except(expected).isEmpty && expected.except(r).isEmpty)
  }

  test("prefixSum on empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(Double, Long)].toDF("v", "n")
    assert(GlobalRank.prefixSum(df, col("n"), col("v"), Nil).count() == 0)
  }

  test("q97 pruning preserves surviving token order and multiplicity") {
    val row = TrainPrep.q97.run(spark, sf0001)
      .orderBy("doc_id")
      .limit(1)
      .collect()(0)
    val cleaned = row.getAs[String]("cleaned")
    val original = graft.core.Tables.documents(spark, sf0001)
      .orderBy("doc_id").limit(1).collect()(0).getAs[String]("text")
    val keptSet = cleaned.split(" ").filter(_.nonEmpty).toSet
    val expected = original.split(" ").filter(keptSet.contains).mkString(" ")
    assert(cleaned == expected, "kept tokens must stay in original order")
    assert(row.getAs[Int]("n_after") <= row.getAs[Int]("n_before"))
  }

  test("q95/q96/q98 run on the fixture and produce sane shapes") {
    val dec = TrainPrep.q95.run(spark, sf0001)
    val decRows = dec.collect()
    assert(decRows.nonEmpty)
    // every overlap fraction is in [0, 1]
    assert(decRows.forall { r =>
      val f = r.getAs[Double]("overlap_frac"); f >= 0.0 && f <= 1.0
    })

    val oov = TrainPrep.q96.run(spark, sf0001).collect()
    assert(oov.nonEmpty)
    assert(oov.forall { r =>
      val f = r.getAs[Double]("avg_oov"); f >= 0.0 && f <= 1.0
    })

    val packed = TrainPrep.q98.run(spark, sf0001).collect()
    assert(packed.nonEmpty)
    // block ids are contiguous from 0, and token totals per block hover
    // around the 512 block size (a doc can straddle blocks, so a block's
    // docs may start before the boundary; totals stay within one max doc)
    val ids = packed.map(_.getAs[Int]("seq_id")).toSeq
    assert(ids == (0 until packed.length))
    val total = packed.map(_.getAs[Long]("n_tokens")).sum
    val expectedTotal = graft.core.Tables.documents(spark, sf0001)
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(total == expectedTotal, "packing must conserve tokens")
  }
}
