package graft.bdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Per-trajectory kinematic features (SURVEY §2.5 W1-W4, §7 step 3).
  *
  * The canonical window is `partitionBy(game_id, play_id, nfl_id).orderBy(frame_id)`
  * — one hash exchange per query; Catalyst merges all specs sharing it into a
  * single WindowExec so lag/lead/min/max sort once.
  */
object Kinematics {

  val FrameDt = 0.1 // 10 Hz tracking (reference: README.md:74-79)

  def trajWindow: WindowSpec =
    Window.partitionBy(Schemas.trajectoryKeys.map(col): _*).orderBy("frame_id")

  def playWindow: WindowSpec =
    Window.partitionBy(Schemas.playKeys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** W1: finite-difference velocity from positions (reference:
    * preprocess.py:123-127 — groupby().diff() / 0.1). First frame → null,
    * filled 0 to match the reference's fillna(0). */
  def addVelocity(df: DataFrame, xc: String = "x_norm", yc: String = "y_norm"): DataFrame = {
    val w = trajWindow
    df.withColumn("vx", coalesce((col(xc) - lag(xc, 1).over(w)) / FrameDt, lit(0.0)))
      .withColumn("vy", coalesce((col(yc) - lag(yc, 1).over(w)) / FrameDt, lit(0.0)))
      .withColumn("speed_calc", sqrt(col("vx") * col("vx") + col("vy") * col("vy")))
  }

  /** Euclidean distance between two points as a Column. */
  def dist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))

  /** Geometry toward the ball-landing point (reference: preprocess.py:164-192):
    * distance, bearing, heading alignment cosine. */
  def addBallGeometry(df: DataFrame,
      xc: String = "x_norm", yc: String = "y_norm",
      bx: String = "ball_land_x_norm", by: String = "ball_land_y_norm"): DataFrame = {
    val dx = col(bx) - col(xc)
    val dy = col(by) - col(yc)
    df.withColumn("dist_to_ball", sqrt(dx * dx + dy * dy))
      // Tracking angles are compass-style (0° = +y, clockwise): bearing uses
      // atan2(dx, dy) in that convention (reference: preprocess.py:175-187).
      .withColumn("bearing_to_ball_deg", pmod(degrees(atan2(dx, dy)), lit(360.0)))
      .withColumn("heading_align_cos",
        cos(radians(col("dir_norm") - col("bearing_to_ball_deg"))))
  }

  /** W3: frame index + elapsed time within the trajectory (reference:
    * cumcount() → frame_since_throw, time = n*0.1; preprocess.py:195-201). */
  def addFrameIndex(df: DataFrame): DataFrame = {
    val idx = col("frame_id") -
      min("frame_id").over(Window.partitionBy(Schemas.trajectoryKeys.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    df.withColumn("frame_since_start", idx)
      .withColumn("time_since_start", idx * FrameDt)
  }

  /** W11: wrap-around absolute angle difference in degrees. */
  def angleDiff(a: Column, b: Column): Column = {
    val d = abs(a - b)
    least(d, lit(360.0) - d)
  }

  /** Per-frame direction change |Δdir| with wrap (reference: routes.py:117-126). */
  def addDirectionChange(df: DataFrame, dirCol: String = "dir_norm"): DataFrame =
    df.withColumn("dir_change",
      coalesce(angleDiff(col(dirCol), lag(dirCol, 1).over(trajWindow)), lit(0.0)))
}
