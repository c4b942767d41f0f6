package graft.bdb

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The expected-convergence regressor behind a narrow contract
  * (SURVEY §7 step 7): DataFrame(per-frame features) → DataFrame(+ pred).
  *
  * The reference trains a Keras LSTM (Masking→LSTM64→LSTM32→TD Dense,
  * reference: bdb2026/models.py:24-138) — sequence models have no
  * Catalyst/MLlib analogue, so the Spark-native core offers:
  *
  *  - [[StubModel]]: joins precomputed predictions (e.g. the reference's
  *    committed predictions CSV) — unblocks every downstream metric exactly.
  *  - [[GbtModel]]: distributed MLlib GBTRegressor on the same per-frame
  *    features — no sequence memory, but residual metrics stay well-defined
  *    and the whole pipeline remains one Spark DAG.
  *  - External LSTM parity runs against the padded sequence table from
  *    [[Sequences]] exported to Parquet — explicitly outside the core.
  *
  * All implementations add `predicted_converge_rate` and `residual`
  * (= actual − predicted, reference: metrics.py residual convention).
  */
trait ConvergenceModel {
  def predict(frames: DataFrame): DataFrame

  final def withResidual(frames: DataFrame,
      actualCol: String = "converge_rate"): DataFrame =
    predict(frames).withColumn("residual",
      col(actualCol) - col("predicted_converge_rate"))
}

/** Precomputed-prediction join (keys: game_id, play_id, frame_id). */
final class StubModel(predictions: DataFrame) extends ConvergenceModel {
  override def predict(frames: DataFrame): DataFrame =
    frames.join(
      predictions.select(col("game_id"), col("play_id"), col("frame_id"),
        col("predicted_converge_rate")),
      Seq("game_id", "play_id", "frame_id"), "left")
}

/** Distributed gradient-boosted-trees regressor on per-frame features. */
final class GbtModel private (model: GBTRegressionModel, features: Seq[String])
    extends ConvergenceModel {
  override def predict(frames: DataFrame): DataFrame = {
    val assembled = GbtModel.assemble(frames, features)
    model.setPredictionCol("predicted_converge_rate")
      .transform(assembled).drop("gbt_features")
  }
}

object GbtModel {
  private def assemble(df: DataFrame, features: Seq[String]): DataFrame =
    new VectorAssembler().setInputCols(features.toArray)
      .setOutputCol("gbt_features").setHandleInvalid("keep")
      .transform(df)

  def train(train: DataFrame, features: Seq[String],
      labelCol: String = "converge_rate",
      maxIter: Int = 20, maxDepth: Int = 5, seed: Long = 42L): GbtModel = {
    val fitted = new GBTRegressor()
      .setFeaturesCol("gbt_features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .fit(assemble(train, features))
    new GbtModel(fitted, features)
  }
}

object ModelEval {

  /** Leakage-safe split: hash-partition whole games into train/val
    * (reference: BDB_2026.ipynb cell 91 splits by game_id). */
  def splitByGame(df: DataFrame, valFraction: Double = 0.2): (DataFrame, DataFrame) = {
    val bucket = pmod(hash(col("game_id")), lit(100))
    val cut = (valFraction * 100).toInt
    (df.filter(bucket >= cut), df.filter(bucket < cut))
  }

  /** MSE/RMSE/MAE/R² in one aggregation pass (reference: cell 102 acceptance:
    * R²=0.9466 for the LSTM; the GBT baseline is graded against the same
    * formula). R² from sums: 1 − SSE / (Σy² − (Σy)²/n). */
  def regressionMetrics(df: DataFrame, actual: String = "converge_rate",
      pred: String = "predicted_converge_rate"): DataFrame = {
    val err = col(actual) - col(pred)
    val y = col(actual)
    df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(err * err).as("sse"),
      sum(abs(err)).as("sae"),
      sum(y).as("sy"),
      sum(y * y).as("syy"))
      .select(
        (col("sse") / col("n")).as("mse"),
        sqrt(col("sse") / col("n")).as("rmse"),
        (col("sae") / col("n")).as("mae"),
        (lit(1.0) - col("sse") /
          (col("syy") - col("sy") * col("sy") / col("n"))).as("r2"))
  }
}
