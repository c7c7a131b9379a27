package graft.pipeline

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** spark.ml mirror of the reference's ML surface (SURVEY §2.11;
  * scripts/ml_pipeline.py:229-457): feature assembly, scaling, linear
  * regression, clamped predictions, RMSE/MAE/R² evaluation, and the
  * ml_predictions result shape (scripts/ml_pipeline.py:651-667).
  *
  * Distributed end to end: VectorAssembler/StandardScaler are narrow
  * transforms; LinearRegression with the "normal" solver is one
  * treeAggregate pass — no driver-side row data.
  */
object MlPipeline {

  case class Metrics(rmse: Double, mae: Double, r2: Double)

  /** Train y ~ features with scaling, score, clamp at 0 (P9:
    * ml_pipeline.py:440), and emit the ml_predictions-shaped frame +
    * metrics.
    */
  def trainAndScore(train: DataFrame, test: DataFrame, featureCols: Seq[String],
      labelCol: String, modelName: String = "linear_regression")
      : (DataFrame, Metrics) = {
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("rawFeatures").setHandleInvalid("skip"),
      new StandardScaler().setInputCol("rawFeatures").setOutputCol("features"),
      new LinearRegression().setFeaturesCol("features").setLabelCol(labelCol)
        .setSolver("normal").setRegParam(0.0)))
    val model = pipe.fit(train)
    val scored = model.transform(test)
      .withColumn("predicted", greatest(col("prediction"), lit(0.0)))
    val metrics = Metrics(
      evalMetric(scored, labelCol, "rmse"),
      evalMetric(scored, labelCol, "mae"),
      evalMetric(scored, labelCol, "r2"))
    val predictions = scored.select(
      col("unit_nr"), col("time_cycles").as("cycle"), col("dataset"),
      lit(modelName).as("model_name"),
      col("predicted").as("predicted_rul"),
      col(labelCol).as("actual_rul"),
      abs(col(labelCol) - col("predicted")).as("absolute_error"),
      pow(col(labelCol) - col("predicted"), 2).as("squared_error"))
      // P12 (ml_pipeline.py:660; DDL DEFAULT CURRENT_TIMESTAMP): stamp at
      // write time; excluded from determinism-sensitive comparisons.
      .withColumn("prediction_timestamp", current_timestamp())
    (predictions, metrics)
  }

  private def evalMetric(scored: DataFrame, labelCol: String,
      metric: String): Double =
    new RegressionEvaluator().setLabelCol(labelCol)
      .setPredictionCol("predicted").setMetricName(metric).evaluate(scored)

  /** A10 rollup over a predictions table (ml_pipeline_gpu.py:795-816). */
  def metricRollup(predictions: DataFrame): DataFrame =
    predictions.groupBy("model_name", "dataset").agg(
      count(lit(1)).as("n"),
      avg(col("absolute_error")).as("avg_absolute_error"),
      sqrt(avg(col("squared_error"))).as("rmse"))
      .orderBy("avg_absolute_error")
}
