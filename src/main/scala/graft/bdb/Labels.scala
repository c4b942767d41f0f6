package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ground-truth label attachment + convergence-rate computation
  * (SURVEY §7 step 5).
  */
object Labels {

  /** Attach post-throw ground-truth positions via the 4-col inner join
    * (reference: preprocess.py:516-563). Keeps the reference's fail-loud
    * empty-join guard (:548-549) as a cheap isEmpty action.
    */
  def attachOutputLabels(features: DataFrame, output: DataFrame,
      failOnEmpty: Boolean = true): DataFrame = {
    val labeled = features.join(
      output.select(col("game_id"), col("play_id"), col("nfl_id"), col("frame_id"),
        col("x").as("label_x"), col("y").as("label_y")),
      Schemas.frameKeys, "inner")
    if (failOnEmpty && labeled.isEmpty)
      throw new IllegalStateException(
        "attachOutputLabels: join produced 0 rows — key mismatch between features and output")
    labeled
  }

  /** Convergence rate toward the ball-landing point.
    *
    * Canonical definition (recorded per SURVEY §7.5): the notebook's
    * `dist[t] − dist[t+1]` in yd/frame (reference: BDB_2026.ipynb cell 80) —
    * it is what the committed predictions/golden CSVs contain. Positive =
    * closing on the ball. Last frame → 0 (lead is null).
    */
  def addConvergeRate(df: DataFrame, distCol: String = "dist_to_ball"): DataFrame =
    df.withColumn("converge_rate",
      coalesce(col(distCol) - lead(distCol, 1).over(Kinematics.trajWindow), lit(0.0)))

  /** The package's variant: `(dist[t-1] − dist[t]) / 0.1` in yd/s
    * (reference: preprocess.py:419-437) — same signal, different scale and
    * alignment; offered behind its own name, never silently substituted.
    */
  def addConvergeRatePackageStyle(df: DataFrame,
      distCol: String = "dist_to_ball"): DataFrame =
    df.withColumn("converge_rate_yps",
      coalesce((lag(distCol, 1).over(Kinematics.trajWindow) - col(distCol))
        / Kinematics.FrameDt, lit(0.0)))

  /** Completed-pass restriction as a left-semi join (reference:
    * preprocess.py:302-327 does inner-join-on-deduped-keys; semi-join is the
    * exact semantics with no dedup step or row blowup).
    */
  def filterToCompletedPasses(df: DataFrame, supp: DataFrame): DataFrame =
    df.join(
      broadcast(supp.filter(col("pass_result") === "C")
        .select("game_id", "play_id")),
      Schemas.playKeys, "left_semi")
}
