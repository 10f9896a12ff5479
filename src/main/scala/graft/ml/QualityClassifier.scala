package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable document-quality filter — the fastText-style linear
  * classifier every pretraining pipeline runs (CCNet/GPT-3 style): weak
  * labels from source provenance (curated dumps positive, raw crawls
  * negative), cheap surface features, logistic regression, then score the
  * WHOLE corpus and keep the confident tail.
  *
  * Scale shape: features are pure per-row expressions (one projection,
  * zero shuffles); the trainer sees only the labeled subset; scoring is a
  * broadcast of the fitted coefficient vector back into a row-local
  * expression — no MLlib transformer on the hot path, so the scored scan
  * stays in whole-stage codegen and works on a 100 TB corpus exactly like
  * any other projection.
  */
object QualityClassifier {

  /** The q34/q80 signal family as named row-local expressions over the
    * text column — shared by the [[features]] projection and the inlined
    * [[scoreColumn]] form. */
  private def featureExprs(t: org.apache.spark.sql.Column)
      : Seq[(String, org.apache.spark.sql.Column)] = {
    val toks = split(t, " ")
    Seq(
      "n_tokens" -> size(toks).cast("double"),
      "ttr" -> (size(array_distinct(toks)) / size(toks)),
      "avg_word_len" -> ((length(t) - size(toks) + 1) / size(toks)),
      "digit_ratio" ->
        ((length(t) - length(regexp_replace(t, "[0-9]", ""))) / length(t)),
      "nonalpha_ratio" ->
        ((length(t) - length(regexp_replace(t, "[^a-z ]", ""))) / length(t)),
      "max_run" -> {
        // longest immediate-repetition run of one token, the q87 signal
        val n1 = greatest(size(toks) - 1, lit(1))
        val pairs = zip_with(
          slice(toks, lit(1), n1),
          slice(toks, lit(2), n1),
          (a, b) => when(a === b, 1).otherwise(0))
        coalesce(aggregate(pairs, lit(0), (acc, x) => acc + x), lit(0)).cast("double")
      })
  }

  /** Surface quality features per document — the q34/q80 signal family
    * as one codegen-friendly projection. */
  def features(docs: DataFrame, textCol: String): DataFrame =
    featureExprs(col(textCol)).foldLeft(docs) {
      case (d, (name, e)) => d.withColumn(name, e)
    }

  private val FeatureCols =
    Array("n_tokens", "ttr", "avg_word_len", "digit_ratio", "nonalpha_ratio", "max_run")

  /** Fitted model: (featureCol -> coefficient on the STANDARDIZED scale
    * folded back to raw units), intercept, and held-out ROC AUC. */
  final case class Fitted(weights: Map[String, Double], intercept: Double, auc: Double)

  /** Train on weak provenance labels and return the model as PLAIN
    * numbers: coefficients are unfolded from the standardized space back
    * to raw feature units, so scoring needs no MLlib at all.
    *
    * @param labeled rows with the [[features]] columns and a 0/1 `label`
    */
  def fit(spark: SparkSession, labeled: DataFrame, seed: Long = 42L): Fitted = {
    val Array(train, heldOut) = labeled.randomSplit(Array(0.8, 0.2), seed)
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("rawFeatures")
    val scaler = new StandardScaler()
      .setInputCol("rawFeatures").setOutputCol("features").setWithMean(false)
    val trainAsm = assembler.transform(train)
    val scalerModel = scaler.fit(trainAsm)
    val lr = new LogisticRegression().setMaxIter(50).setRegParam(1e-4)
    val model = lr.fit(scalerModel.transform(trainAsm))
    // fold the 1/std scaling into the coefficients: w_raw = w_std / std
    val stds = scalerModel.std.toArray
    val ws = FeatureCols.zip(model.coefficients.toArray.zip(stds).map {
      case (w, s) => if (s == 0.0) 0.0 else w / s
    }).toMap
    // Held-out AUC from OUR scoring expression, not model.transform: the
    // MLlib path drags the fitted model (and its SparkSession-referencing
    // training summary) into task closures; the expression path is the
    // one production uses anyway, so the diagnostic measures exactly what
    // ships. Binned Mann-Whitney (1000 prob buckets, within-bucket ties
    // at 1/2) — one aggregation to ≤ 2·1001 rows, scale-independent, the
    // same resolution MLlib's evaluator uses by default.
    val noEval = Fitted(ws, model.intercept, Double.NaN)
    val hist = score(heldOut, noEval)
      .groupBy(
        floor(col("quality_prob") * 1000).cast("int").as("b"),
        col("label").cast("int").as("y"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val buckets = hist.keys.map(_._1).toSeq.distinct.sorted
    val totPos = hist.collect { case ((_, 1), n) => n }.sum.toDouble
    val totNeg = hist.collect { case ((_, 0), n) => n }.sum.toDouble
    var cumNeg = 0.0
    var u = 0.0
    buckets.foreach { b =>
      val pos = hist.getOrElse((b, 1), 0L).toDouble
      val neg = hist.getOrElse((b, 0), 0L).toDouble
      u += pos * (cumNeg + neg / 2)
      cumNeg += neg
    }
    val auc = if (totPos == 0 || totNeg == 0) Double.NaN else u / (totPos * totNeg)
    Fitted(ws, model.intercept, auc)
  }

  /** Score with the fitted weights as a pure row-local expression:
    * sigmoid(w·x + b) — broadcastable-by-literal, codegen-friendly,
    * no model object anywhere near the 100 TB scan. */
  def score(withFeatures: DataFrame, fitted: Fitted): DataFrame = {
    val linear = FeatureCols.foldLeft(lit(fitted.intercept)) { (acc, c) =>
      acc + col(c) * lit(fitted.weights(c))
    }
    withFeatures.withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-linear)))
  }

  /** The fitted scorer as ONE row-local Column over the raw text — the
    * [[features]] projection inlined into the sigmoid, so the trainable
    * gate plugs in anywhere a quality expression is expected (e.g.
    * `CorpusPipeline.prepare(quality = QualityClassifier.scoreColumn(_,
    * fitted))`): still pure codegen, zero shuffles, no model object near
    * the scan. */
  def scoreColumn(textCol: org.apache.spark.sql.Column, fitted: Fitted)
      : org.apache.spark.sql.Column = {
    val exprs = featureExprs(textCol).toMap
    val linear = FeatureCols.foldLeft(lit(fitted.intercept)) { (acc, c) =>
      acc + exprs(c) * lit(fitted.weights(c))
    }
    lit(1.0) / (lit(1.0) + exp(-linear))
  }
}
