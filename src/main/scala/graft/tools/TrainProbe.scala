package graft.tools

import graft.bdb._
import org.apache.spark.sql.functions._

/** Diagnostic main for the in-engine LSTM trainer ([[graft.bdb.TrainedLstmModel]]):
  * trains on the synthetic convergence fixture with CLI-tunable epochs and
  * prints held-out all-frames and causal-frames R² — the numbers the
  * ModelSpec acceptance pins. Usage:
  *   scripts/run_tool.sh graft.tools.TrainProbe [epochs] [batches] [games]
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val epochs = if (args.length > 0) args(0).toInt else 150
    val batches = if (args.length > 1) args(1).toInt else 2
    val games = if (args.length > 2) args(2).toInt else 8
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val t = Synth.tracking(spark, nGames = games, playsPerGame = 25)
    val supp = Synth.supplementary(t)
    val (_, labeled0) = Pipeline.labeledFeatures(t, supp)
    // Same feature table the GBT trains on (Pipeline phase 2): per-frame
    // kinematics + the causal lag/EWMA/rolling sequence features. The LSTM
    // could in principle re-derive the lags from its own state, but the
    // reference feeds its LSTM 28 engineered features too (cell 88) — raw
    // 7-feature probes plateau at held-out R² ~0.86.
    val labeled = SequenceFeatures.add(labeled0).cache()
    val features = Seq("dist_to_ball", "heading_align_cos", "vx", "vy", "s",
      "defender_separation", "time_since_start") ++ SequenceFeatures.cols
    val (train, valid) = ModelEval.splitByGame(labeled, 0.2)
    val model = TrainedLstmModel.train(train, Some(valid), features,
      epochs = epochs, batchesPerEpoch = batches)
    val scoredValid = model.withResidual(valid)
    val lastW = org.apache.spark.sql.expressions.Window
      .partitionBy(Schemas.trajectoryKeys.map(col): _*)
    val causalValid = scoredValid
      .withColumn("__last", col("frame_id") === max(col("frame_id")).over(lastW))
      .filter(!col("__last")).drop("__last")
    val all = ModelEval.regressionMetrics(scoredValid).head()
    val causal = ModelEval.regressionMetrics(causalValid).head()
    println(f"[trainprobe] epochs=$epochs batches=$batches games=$games " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    println(f"[trainprobe] held-out r2=${all.getAs[Double]("r2")}%.4f " +
      f"rmse=${all.getAs[Double]("rmse")}%.4f; causal-frames " +
      f"r2=${causal.getAs[Double]("r2")}%.4f " +
      f"rmse=${causal.getAs[Double]("rmse")}%.4f " +
      "(reference LSTM acceptance: 0.9466, cell 102)")
    spark.stop()
  }
}
