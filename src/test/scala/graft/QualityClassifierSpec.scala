package graft

import org.apache.spark.sql.functions._

import graft.ml.QualityClassifier

/** Contract of [[QualityClassifier]]: the features separate an obviously
  * separable corpus (held-out AUC), the raw-unit weight unfolding makes
  * the expression score the whole corpus without MLlib, and scoring is a
  * monotone function of the linear term.
  */
class QualityClassifierSpec extends SparkSuite {

  // 60 clean docs (varied vocabulary, no digits/symbols, no repetition)
  // vs 60 spammy docs (heavy repetition + digits + symbols).
  private def corpus = {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    val clean = (0 until 60).map { i =>
      val toks = (0 until 30).map(j => words((i * 7 + j * 3) % words.size))
      (i.toLong, toks.mkString(" "), 1.0)
    }
    val spam = (0 until 60).map { i =>
      val unit = s"buy${i % 9}99 $$$$ win"
      (100L + i, Seq.fill(10)(unit).mkString(" "), 0.0)
    }
    (clean ++ spam).toDF("doc_id", "text", "label")
  }

  test("separates clean from spam: held-out AUC > 0.9, scores ordered") {
    val feats = QualityClassifier.features(corpus, "text")
    val fitted = QualityClassifier.fit(spark, feats)
    assert(fitted.auc > 0.9, s"AUC ${fitted.auc}")
    val scored = QualityClassifier.score(feats, fitted)
      .groupBy("label").agg(avg("quality_prob").as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(scored(1.0) > 0.8 && scored(0.0) < 0.2,
      s"clean=${scored(1.0)} spam=${scored(0.0)}")
  }

  test("features are the documented per-row surface signals") {
    import spark.implicits._
    val f = QualityClassifier.features(
      Seq((1L, "ab ab cd1 !")).toDF("doc_id", "text"), "text")
      .collect().head
    def g(n: String): Double = f.getDouble(f.fieldIndex(n))
    assert(g("n_tokens") == 4.0)
    assert(g("ttr") == 0.75)          // ab, cd1, ! distinct of 4
    assert(g("avg_word_len") == 2.0)  // 8 non-space chars / 4 tokens
    assert(math.abs(g("digit_ratio") - 1.0 / 11) < 1e-12)
    assert(math.abs(g("nonalpha_ratio") - 2.0 / 11) < 1e-12) // '1' and '!'
    assert(g("max_run") == 1.0)       // one immediate ab->ab repeat
  }

  test("the fitted gate scores a STREAM (pure projection => stream-compatible as-is)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feats = QualityClassifier.features(corpus, "text")
    val fitted = QualityClassifier.fit(spark, feats)
    val ms = MemoryStream[(Long, String)]
    val batchDocs = corpus.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    ms.addData(batchDocs.toIndexedSeq: _*)
    val gated = QualityClassifier.score(
      QualityClassifier.features(ms.toDF().toDF("doc_id", "text"), "text"), fitted)
      .filter(col("quality_prob") >= 0.5)
      .select("doc_id")
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("qgate_t").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("qgate_t").as[Long].collect().sorted.toSeq
      val batch = QualityClassifier.score(feats, fitted)
        .filter(col("quality_prob") >= 0.5)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("scoring the corpus is a plain projection (no shuffle in the scored scan)") {
    val feats = QualityClassifier.features(corpus, "text")
    val fitted = QualityClassifier.fit(spark, feats)
    val plan = QualityClassifier.score(feats, fitted)
      .select("doc_id", "quality_prob")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
}
