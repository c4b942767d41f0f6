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

/** In-engine forward-pass inference over the reference's committed Keras
  * weights (reference: models.py:24-67 architecture; artifacts saved at
  * BDB_2026.ipynb cell 107): pad sequences with [[Sequences.build]], run the
  * float32 LSTM forward pass ([[graft.ml.KerasLstm]] — weights read straight
  * from the `.h5` by the pure-JVM [[graft.ml.H5Lite]]), and join the
  * per-frame predictions back positionally (the reference renumbers
  * post-throw frames 1..L in its predictions CSV — `frame_idx` is the rank
  * of `frame_id` within the trajectory, which equals `frame_id` when frames
  * are already 1-based and dense).
  *
  * The committed per-frame INPUT features were never published (only the
  * predictions were), so end-to-end numeric parity against the predictions
  * CSV is unverifiable from public artifacts; the forward pass itself is
  * pinned to Keras semantics by the cross-implementation fixture in
  * KerasLstmSpec instead.
  */
final class LstmModel(modelPath: String, features: Seq[String],
    maxLen: Int = 25) extends ConvergenceModel {
  private val model = graft.ml.KerasLstm.load(modelPath)
  require(model.nFeatures == features.size,
    s"$modelPath expects ${model.nFeatures} features, got ${features.size}")

  override def predict(frames: DataFrame): DataFrame =
    LstmScoring.scoreAndAttach(frames, frames, features, model, maxLen)
}

/** Shared LSTM serving path: build padded sequences from `featFrames`
  * (the caller's possibly-standardized view of `frames`), score them with
  * the float32 forward pass, and join the per-frame predictions back to
  * `frames` positionally. */
private[bdb] object LstmScoring {
  def scoreAndAttach(frames: DataFrame, featFrames: DataFrame,
      features: Seq[String], model: graft.ml.KerasLstm.Model,
      maxLen: Int, unscale: DataFrame => DataFrame = identity): DataFrame = {
    val keys = Schemas.trajectoryKeys
    val seqs = Sequences.build(featFrames, features, maxLen)
    val preds = unscale(graft.ml.KerasLstm.scoreSequences(seqs, model, keys))
    // Sequences.build keeps the LAST maxLen frames, so seq position 1 is
    // frame rank (L - maxLen + 1) on long trajectories: shift the rank;
    // truncated head frames get frame_idx <= 0 → no match → null prediction.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val rankW = w.orderBy(col("frame_id"))
    frames
      .withColumn("frame_idx",
        (row_number().over(rankW) -
          greatest(count(lit(1)).over(w) - maxLen, lit(0))).cast("long"))
      .join(preds, keys :+ "frame_idx", "left")
      .drop("frame_idx")
  }
}

/** **In-engine TRAINED convergence LSTM** (r17 verdict #5 — the one
  * reference capability the engine previously could not reproduce): the
  * exact reference architecture (models.py:23-67), trained DISTRIBUTED by
  * [[graft.ml.LstmTrainer]]'s synchronous data-parallel BPTT (gradients
  * treeAggregate'd, Adam on the driver, weights broadcast per step) and
  * served by the same [[graft.ml.KerasLstm]] float32 forward pass as the
  * committed reference weights.
  *
  * Features AND label are z-scored on TRAIN statistics (stored in the
  * model; applied at predict, predictions un-scaled back): with ~200 Adam
  * steps on the fixture, raw-magnitude labels would spend the whole budget
  * growing the output head. Null features impute to the mean (0 after
  * scaling) — same tolerance as GBT's handleInvalid=keep. */
final class TrainedLstmModel private (
    val model: graft.ml.KerasLstm.Model,
    features: Seq[String],
    featMean: Array[Double], featStd: Array[Double],
    labelMean: Double, labelStd: Double, maxLen: Int) extends ConvergenceModel {

  override def predict(frames: DataFrame): DataFrame =
    LstmScoring.scoreAndAttach(
      frames, TrainedLstmModel.standardize(frames, features, featMean, featStd),
      features, model, maxLen,
      unscale = _.withColumn("predicted_converge_rate",
        col("predicted_converge_rate") * labelStd + labelMean))
}

object TrainedLstmModel {

  private[bdb] def standardize(df: DataFrame, features: Seq[String],
      mean: Array[Double], std: Array[Double]): DataFrame =
    features.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
      d.withColumn(f, coalesce((col(f) - mean(i)) / std(i), lit(0.0)))
    }

  /** Train on labeled frames (the [[Pipeline.labeledFeatures]] contract).
    * `valFrames` drives early stopping with best-weights restore, like the
    * reference's callbacks (models.py:110-118). */
  def train(trainFrames: DataFrame, valFrames: Option[DataFrame],
      features: Seq[String], labelCol: String = "converge_rate",
      maxLen: Int = 25, epochs: Int = 150, batchesPerEpoch: Int = 2,
      patience: Int = 20, seed: Long = 42L): TrainedLstmModel = {
    val statCols = features.flatMap(f =>
      Seq(avg(col(f)), coalesce(stddev_samp(col(f)), lit(1.0)))) ++
      Seq(avg(col(labelCol)), coalesce(stddev_samp(col(labelCol)), lit(1.0)))
    val r = trainFrames.agg(statCols.head, statCols.tail: _*).head()
    val featMean = features.indices.map(i => r.getDouble(2 * i)).toArray
    val featStd = features.indices
      .map(i => math.max(r.getDouble(2 * i + 1), 1e-9)).toArray
    val labelMean = r.getDouble(2 * features.size)
    val labelStd = math.max(r.getDouble(2 * features.size + 1), 1e-9)

    def prep(df: DataFrame): DataFrame = Sequences.build(
      standardize(df, features, featMean, featStd)
        .withColumn(labelCol, (col(labelCol) - labelMean) / labelStd),
      features :+ labelCol, maxLen)

    val cfg = graft.ml.LstmTrainer.Config(nFeatures = features.size,
      epochs = epochs, batchesPerEpoch = batchesPerEpoch,
      patience = patience, seed = seed)
    val trained = graft.ml.LstmTrainer.train(
      prep(trainFrames), valFrames.map(prep), Schemas.trajectoryKeys, cfg)
    org.slf4j.LoggerFactory.getLogger("graft.bdb.TrainedLstmModel").info(
      s"trained ${trained.epochsRun} epochs (best ${trained.bestEpoch}): " +
        f"train mse ${trained.trainLoss}%.5f, monitored ${trained.valLoss}%.5f " +
        "(standardized units)")
    new TrainedLstmModel(trained.model, features, featMean, featStd,
      labelMean, labelStd, maxLen)
  }
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
      maxIter: Int = 20, maxDepth: Int = 5, seed: Long = 42L,
      minInstancesPerNode: Int = 1, subsamplingRate: Double = 1.0): GbtModel = {
    val fitted = new GBTRegressor()
      .setFeaturesCol("gbt_features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .setMinInstancesPerNode(minInstancesPerNode)
      .setSubsamplingRate(subsamplingRate)
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
