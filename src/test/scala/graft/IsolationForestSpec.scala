package graft

import graft.ops.IsolationForest

/** Contract of [[IsolationForest.score]]: planted multivariate outliers
  * dominate the score ranking, scores live in (0,1) with inliers near
  * the paper's ~0.5, results are deterministic and layout-proof, and
  * the normalizer matches the closed form. */
class IsolationForestSpec extends SparkSuite {
  import spark.implicits._

  // a tight 2-d blob (grid jitter around (10, 10)) + 5 far outliers —
  // anomalous JOINTLY, not on any single marginal alone
  private val inliers = (1 to 400).map { i =>
    (i.toLong, 10.0 + (i % 20) * 0.05, 10.0 + (i / 20) * 0.05)
  }
  private val outliers = Seq(
    (901L, 50.0, 50.0), (902L, -30.0, 10.0), (903L, 10.0, -30.0),
    (904L, 60.0, -20.0), (905L, -25.0, 55.0))

  test("planted outliers take exactly the top score ranks; inliers sit near 0.5") {
    val df = (inliers ++ outliers).toDF("id", "x", "y")
    val scored = IsolationForest.score(df, "id", Seq("x", "y"))
      .orderBy(org.apache.spark.sql.functions.desc("if_score"), org.apache.spark.sql.functions.col("id"))
      .select("id", "if_score").collect()
    val top5 = scored.take(5).map(_.getLong(0)).toSet
    assert(top5 == outliers.map(_._1).toSet,
      s"top-5 must be the planted outliers, got ${top5.mkString(",")}")
    scored.foreach(r => assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0))
    val inlierMean = scored.drop(5).map(_.getDouble(1)).sum / 400.0
    val outlierMin = scored.take(5).map(_.getDouble(1)).min
    assert(inlierMean < 0.6, s"inlier mean score $inlierMean should sit near 0.5")
    assert(outlierMin > inlierMean + 0.1,
      s"outliers ($outlierMin) must separate clearly from inliers ($inlierMean)")
  }

  test("deterministic and layout-proof: same seed ⇒ identical scores on any partitioning") {
    val df = (inliers ++ outliers).toDF("id", "x", "y")
    val a = IsolationForest.score(df, "id", Seq("x", "y"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getAs[Double]("if_score")))
    val b = IsolationForest.score(df.repartition(13), "id", Seq("x", "y"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getAs[Double]("if_score")))
    assert(a.toSeq == b.toSeq)
    // a different seed moves scores but not the anomaly verdict
    val c = IsolationForest.score(df, "id", Seq("x", "y"), seed = 7L)
      .orderBy(org.apache.spark.sql.functions.desc("if_score"))
      .limit(5).collect().map(_.getLong(0)).toSet
    assert(c == outliers.map(_._1).toSet)
  }

  test("normalizer matches the closed form; refusals") {
    // c(2) = 2(ln 1 + γ) − 1 = 2γ − 1
    assert(math.abs(IsolationForest.cOf(2) - (2 * 0.5772156649015329 - 1.0)) < 1e-12)
    assert(IsolationForest.cOf(1) == 0.0)
    val df = inliers.toDF("id", "x", "y")
    assert(intercept[IllegalArgumentException](
      IsolationForest.score(df, "id", Seq.empty)).getMessage.contains("feature"))
    assert(intercept[IllegalArgumentException](
      IsolationForest.score(df, "id", Seq("x"), sampleSize = 1))
      .getMessage.contains("sampleSize"))
  }

  test("a null feature refuses by name instead of silently imputing zero") {
    import spark.implicits._
    val df = Seq((1L, Some(1.0), 2.0), (2L, None: Option[Double], 3.0),
      (3L, Some(4.0), 5.0)).toDF("id", "a", "b")
    val e = intercept[Exception](
      IsolationForest.score(df, "id", Seq("a", "b"), nTrees = 2, sampleSize = 2)
        .collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("'a' is null"), msgs)
  }
}
