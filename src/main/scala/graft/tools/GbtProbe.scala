package graft.tools

import graft.GraftSession
import graft.bdb._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (round-6 VERDICT #8): how much of the GBT's held-out R² gap to
  * the reference LSTM (0.9466) is the label's forced last-frame zero
  * (lead(dist) null → 0.0), which no CAUSAL feature set can anticipate?
  * Prints held-out metrics on all frames, without the final frame of each
  * trajectory, and with the absolute-error GBT loss, at the ModelSpec
  * scale (8 games × 25 plays).
  */
object GbtProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Synth.tracking(spark, nGames = 8, playsPerGame = 25)
    val prepped = Kinematics.addDirectionChange(
      Kinematics.addFrameIndex(
        Kinematics.addBallGeometry(
          Kinematics.addVelocity(Normalize.notebookStyle(t)))))
    val receivers = prepped.filter(col("player_role") === "Targeted Receiver")
    val defenders = prepped.filter(col("player_side") === "Defense")
    val separation = Separation.nearestDefenderPerFrame(receivers, defenders)
    val labeled = Labels.addConvergeRate(
      Labels.filterToCompletedPasses(
        Separation.attachSeparation(receivers, separation),
        Synth.supplementary(t)))
    val seqFeatured = SequenceFeatures.add(labeled).cache()
    val featureCols = Seq("dist_to_ball", "heading_align_cos", "vx", "vy", "s",
      "defender_separation", "time_since_start") ++ SequenceFeatures.cols
    val (train, valid) = ModelEval.splitByGame(seqFeatured, 0.2)
    val model = GbtModel.train(train, featureCols, maxIter = 100, maxDepth = 3,
      minInstancesPerNode = 10, subsamplingRate = 0.8)
    val scoredValid = model.withResidual(valid)
    val w = Window.partitionBy(Schemas.trajectoryKeys.map(col): _*)
    val tagged = scoredValid.withColumn("__is_last",
      col("frame_id") === max(col("frame_id")).over(w))
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val m = ModelEval.regressionMetrics(df).head()
      println(f"$name%-28s r2=${m.getAs[Double]("r2")}%.4f  " +
        f"rmse=${m.getAs[Double]("rmse")}%.4f  n=${df.count()}%d")
    }
    show("all frames", scoredValid)
    show("excl. final frame", tagged.filter(!col("__is_last")))
    // final frames only: labels are ALL exactly 0.0 (the forced zero), so
    // R² is undefined (zero variance) — print the rmse alone
    val lastRmse = tagged.filter(col("__is_last"))
      .agg(sqrt(avg(col("residual") * col("residual"))).as("rmse")).head()
    println(f"final frames only            rmse=${lastRmse.getAs[Double]("rmse")}%.4f")
    spark.stop()
  }
}
