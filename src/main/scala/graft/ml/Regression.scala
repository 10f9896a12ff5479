package graft.ml

import org.apache.spark.ml.feature.{MinMaxScaler, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML pipeline (SURVEY.md §2.11 M1-M8), thin over spark.ml like the
  * reference (`MLOperations.scala:18-142`) but with the engine fixes:
  * features are aggregated per order from lineitem (one shuffle), metrics
  * are ALSO computed relationally (`sqrt(avg(pow(err,2)))`) so they're
  * assertable without MLlib internals, and the mean-predictor baseline is
  * computed in the same pass.
  */
object Regression {

  /** Per-document features: token counts → label n_chars (the one
    * learnable relationship in the synthetic fixtures — order totals are
    * independent of lineitems there, unlike real TPC-H). */
  def docFeatures(documents: DataFrame): DataFrame =
    documents.select(
      size(split(col("text"), " ")).cast("double").as("n_tokens"),
      size(array_distinct(split(col("text"), " "))).cast("double").as("n_types"),
      length(regexp_replace(col("text"), " ", "")).cast("double").as("n_letters"),
      col("n_chars").cast("double").as("label"))

  /** Train/evaluate: 70/30 seeded split (M1), VectorAssembler (M2),
    * MinMaxScaler fit on train only (M3), LinearRegression (M5),
    * predictions (M6), relational RMSE/MAE/R2 (M7) vs mean baseline (M8),
    * plus model interpretation — per-feature coefficients and the
    * intercept (ref `MLOperations.scala:67-76,169-174` prints these;
    * VERDICT r1 item 6). Returns a (metric, value) DataFrame; coefficient
    * rows are named `coef_<feature>` and refer to the SCALED feature space
    * the model was fit in.
    */
  def trainEval(spark: SparkSession, features: DataFrame): DataFrame = {
    import spark.implicits._
    val featureCols = Array("n_tokens", "n_types", "n_letters")
    val Array(train, test) = features.randomSplit(Array(0.7, 0.3), seed = 42L)

    val assembler = new VectorAssembler()
      .setInputCols(featureCols)
      .setOutputCol("rawFeatures")
    val scaler = new MinMaxScaler().setInputCol("rawFeatures").setOutputCol("features")
    val trainAsm = assembler.transform(train)
    val scalerModel = scaler.fit(trainAsm)
    val trainScaled = scalerModel.transform(trainAsm)
    val testScaled = scalerModel.transform(assembler.transform(test))

    val lr = new LinearRegression().setMaxIter(20).setRegParam(0.0)
    val model = lr.fit(trainScaled)
    val pred = model.transform(testScaled)

    // single-pass relational metrics (M7) — train mean for the baseline (M8)
    val trainMean = train.agg(avg($"label")).first().getDouble(0)
    val m = pred
      .withColumn("base", lit(trainMean))
      .agg(
        sqrt(avg(pow($"label" - $"prediction", 2))).as("rmse"),
        avg(abs($"label" - $"prediction")).as("mae"),
        // R2 single-pass: SS_tot = var_pop(label) * n
        (lit(1.0) - sum(pow($"label" - $"prediction", 2)) / (var_pop($"label") * count(lit(1)))).as("r2"),
        sqrt(avg(pow($"label" - $"base", 2))).as("baseline_rmse"),
        avg(abs($"label" - $"base")).as("baseline_mae"))
      .first()

    val coefRows = featureCols.zip(model.coefficients.toArray)
      .map { case (f, w) => (s"coef_$f", w) }.toSeq

    (Seq(
      ("rmse", m.getDouble(0)),
      ("mae", m.getDouble(1)),
      ("r2", m.getDouble(2)),
      ("baseline_rmse", m.getDouble(3)),
      ("baseline_mae", m.getDouble(4)),
      ("n_train", train.count().toDouble),
      ("n_test", test.count().toDouble)) ++ coefRows :+ ("intercept", model.intercept))
      .toDF("metric", "value")
      .withColumn("value", round(col("value"), 4))
      .orderBy("metric")
  }
}
