package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Receiver↔defender separation operators (SURVEY §7 step 4).
  *
  * The reference computes nearest-defender separation with an
  * O(plays × frames × defenders) Python loop ("may take a minute",
  * BDB_2026.ipynb cell 69). Here each variant is a many-to-many *equi* join on
  * the play (and frame) key followed by a min-aggregation — one shuffle, fully
  * distributed, and the blowup per key is bounded by players-per-play (≤ ~22),
  * so skew is structurally impossible. This is the survey's "single biggest
  * scalability win" (J7).
  */
object Separation {

  /** Separation of each targeted receiver from the nearest defender at the
    * throw frame (reference: preprocess.py:330-402). Throw frame = max
    * frame_id per play, found with a window (no join, J5 form).
    */
  def initialSeparationAtThrow(tracking: DataFrame): DataFrame = {
    val throwFrame = tracking
      .withColumn("throw_frame",
        max("frame_id").over(Window.partitionBy("game_id", "play_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("frame_id") === col("throw_frame"))

    val targets = throwFrame
      .filter(col("player_role") === "Targeted Receiver")
      .select(col("game_id"), col("play_id"), col("nfl_id"),
        col("x_norm").as("tx"), col("y_norm").as("ty"))

    val defenders = throwFrame
      .filter(col("player_side") === "Defense")
      .select(col("game_id"), col("play_id"),
        col("x_norm").as("dx"), col("y_norm").as("dy"))

    targets.join(defenders, Seq("game_id", "play_id"))
      .groupBy("game_id", "play_id", "nfl_id")
      .agg(min(Kinematics.dist(col("tx"), col("ty"), col("dx"), col("dy")))
        .as("initial_separation"))
  }

  /** Per-frame nearest-defender separation for receiver trajectories
    * (reference: BDB_2026.ipynb cell 69 loop → one equi-join on
    * (game, play, frame) + min groupBy).
    *
    * @param receivers rows with (game_id, play_id, nfl_id, frame_id, x_norm, y_norm)
    * @param defenders rows with (game_id, play_id, frame_id, x_norm, y_norm)
    */
  def nearestDefenderPerFrame(receivers: DataFrame, defenders: DataFrame): DataFrame = {
    val r = receivers.select(col("game_id"), col("play_id"), col("nfl_id"),
      col("frame_id"), col("x_norm").as("rx"), col("y_norm").as("ry"))
    val d = defenders.select(col("game_id"), col("play_id"), col("frame_id"),
      col("x_norm").as("dx"), col("y_norm").as("dy"))
    r.join(d, Seq("game_id", "play_id", "frame_id"))
      .groupBy("game_id", "play_id", "nfl_id", "frame_id")
      .agg(min(Kinematics.dist(col("rx"), col("ry"), col("dx"), col("dy")))
        .as("defender_separation"))
  }

  /** Separation from the nearest defender at the catch point (= the play's
    * LAST frame) for every offensive player (reference:
    * preprocess.py:441-513). Same join-over-loop shape as the per-frame
    * variant, restricted to one frame per play; missing defenders → 10.0
    * ("wide open" cap). Feeds the optional `sep_at_catch` route feature.
    */
  def catchSeparation(tracking: DataFrame): DataFrame = {
    val atCatch = tracking
      .withColumn("catch_frame",
        max("frame_id").over(Window.partitionBy("game_id", "play_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("frame_id") === col("catch_frame"))
    val offense = atCatch.filter(col("player_side") === "Offense")
      .select(col("game_id"), col("play_id"), col("nfl_id"),
        col("x_norm").as("ox"), col("y_norm").as("oy"))
    val defense = atCatch.filter(col("player_side") === "Defense")
      .select(col("game_id"), col("play_id"),
        col("x_norm").as("dx"), col("y_norm").as("dy"))
    offense.join(defense, Seq("game_id", "play_id"), "left")
      .groupBy("game_id", "play_id", "nfl_id")
      .agg(min(Kinematics.dist(col("ox"), col("oy"), col("dx"), col("dy")))
        .as("sep_at_catch"))
      .na.fill(Map("sep_at_catch" -> 10.0))
  }

  /** Left-join separation onto a frame table with the reference's missing→20.0
    * default (reference: preprocess.py:489-513, fill 20.0 = "wide open"). */
  def attachSeparation(frames: DataFrame, separation: DataFrame,
      default: Double = 20.0): DataFrame =
    frames.join(separation, Schemas.frameKeys, "left")
      .na.fill(Map("defender_separation" -> default))
}
