package graft

import org.apache.spark.sql.functions._

import graft.ops.ContentChunking

/** [[ContentChunking]] — conservation, boundary determinism, expected
  * chunk length, and the property the whole construction exists for:
  * an edit shifts ONE chunk, not every downstream window. */
class ContentChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def words(n: Int, seed: Int): String = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(_ => s"w${rng.nextInt(40)}").mkString(" ")
  }

  private def chunkTexts(text: String): Seq[String] =
    ContentChunking.chunks(Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("chunk_id").select("chunk_text").as[String].collect().toSeq

  test("chunks conserve the token stream in order; empty docs drop") {
    val t = words(200, 1)
    assert(chunkTexts(t).mkString(" ") == t)
    val empty = ContentChunking.chunks(Seq((1L, "")).toDF("doc_id", "text"), "text", "doc_id")
    assert(empty.count() == 0)
  }

  test("expected chunk length tracks the modulus; chunking is deterministic") {
    val t = words(2000, 2)
    val a = chunkTexts(t)
    assert(a == chunkTexts(t), "pure function of content")
    val mean = 2000.0 / a.size
    assert(mean > 4 && mean < 16, s"mean chunk len $mean vs modulus 8")
  }

  test("edit robustness: a front insertion re-chunks only the prefix") {
    val t = words(300, 3)
    val orig = chunkTexts(t)
    val edited = chunkTexts("inserted " + t)
    // all chunks after the first boundary re-align exactly: the boundary
    // rule depends on a 3-token window, so only the prefix chunk changes
    val shared = orig.toSet.intersect(edited.toSet).size
    assert(shared >= orig.size - 2,
      s"expected all but the prefix chunk shared: ${orig.size} orig, $shared shared")
    // the contrast: fixed 8-token windows lose ALL alignment on the shift
    val fixedOrig = t.split(" ").grouped(8).map(_.mkString(" ")).toSet
    val fixedEdited = ("inserted " + t).split(" ").grouped(8).map(_.mkString(" ")).toSet
    assert(fixedOrig.intersect(fixedEdited).size <= 1)
  }
}
