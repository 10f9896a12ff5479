package graft

import org.apache.spark.sql.functions._

import graft.ops.Embeddings

/** PCA whitening ([[Embeddings.fitWhitening]]/[[Embeddings.whiten]]):
  * whitened output has zero mean and identity covariance, truncation
  * keeps the high-variance directions, and the fit is deterministic. */
class WhitenSpec extends SparkSuite {

  import spark.implicits._

  // correlated 3-d fixture: x2 = x1 + noise, x3 independent small
  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[Seq[Float]] = (1 to 200).map { _ =>
    val a = rnd.nextGaussian() * 5
    val b = a + rnd.nextGaussian()
    val c = rnd.nextGaussian() * 0.1
    Seq(a.toFloat, b.toFloat, c.toFloat)
  }
  private lazy val df = vecs.map(Tuple1(_)).toDF("embedding")

  private def momentsOf(rows: Seq[Seq[Double]]): (Seq[Double], Seq[Seq[Double]]) = {
    val n = rows.size
    val d = rows.head.size
    val mean = (0 until d).map(i => rows.map(_(i)).sum / n)
    val cov = (0 until d).map(i => (0 until d).map(j =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1)))
    (mean, cov)
  }

  test("full whitening yields zero mean and identity covariance") {
    val model = Embeddings.fitWhitening(df, "embedding", d = 3, components = 3)
    val out = Embeddings.whiten(df, "embedding", model, "w")
      .select("w").as[Seq[Double]].collect().toSeq
    val (mean, cov) = momentsOf(out)
    mean.foreach(m => assert(math.abs(m) < 1e-9, s"mean $mean"))
    for (i <- 0 until 3; j <- 0 until 3) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov(i)(j) - want) < 1e-6, s"cov($i,$j)=${cov(i)(j)}")
    }
  }

  test("truncated whitening keeps the high-variance subspace") {
    val model = Embeddings.fitWhitening(df, "embedding", d = 3, components = 2)
    assert(model.w.size == 2 && model.w.head.size == 3)
    val out = Embeddings.whiten(df, "embedding", model, "w")
      .select("w").as[Seq[Double]].collect().toSeq
    assert(out.forall(_.size == 2))
    val (_, cov) = momentsOf(out)
    assert(math.abs(cov(0)(0) - 1.0) < 1e-6 && math.abs(cov(1)(1) - 1.0) < 1e-6)
    // the dominant input direction (x1 + x2 diagonal) must load on the
    // FIRST component: its first two weights share sign and dwarf the
    // third input's weight
    val c0 = model.w.head
    assert(c0(0) * c0(1) > 0, s"c0=$c0")
  }

  test("the fit is deterministic across repeated runs") {
    val a = Embeddings.fitWhitening(df, "embedding", d = 3, components = 3)
    val b = Embeddings.fitWhitening(df, "embedding", d = 3, components = 3)
    assert(a == b)
  }

  test("dimension mismatch fails loudly, not silently") {
    val bad = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("embedding")
    val e = intercept[Exception] {
      Embeddings.fitWhitening(df.union(bad), "embedding", d = 3, components = 2)
    }
    assert(e.getMessage != null)
  }

  test("whitening the fixture embeddings table runs on real data") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val model = Embeddings.fitWhitening(emb, "embedding", d = 64, components = 8)
    val out = Embeddings.whiten(emb, "embedding", model, "w")
      .select("vec_id", "w")
    assert(out.count() == emb.count())
    val (_, cov) = momentsOf(out.select("w").as[Seq[Double]].collect().toSeq)
    (0 until 8).foreach(i => assert(math.abs(cov(i)(i) - 1.0) < 1e-3, s"var($i)=${cov(i)(i)}"))
  }
}
