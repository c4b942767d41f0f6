package graft.bdb

import org.apache.spark.sql.types._

/** Declared schemas for the reference's three base tables (SURVEY §1.2,
  * FIXTURES.md). The reference infers these per-read with pandas
  * (reference: bdb2026/data_io.py:122-124); at 100 TB inference is a full extra
  * pass, so the engine declares fixed StructTypes and reads CSV/Parquet against
  * them (malformed rows surface via PERMISSIVE + _corrupt_record rather than
  * silently shifting dtypes).
  */
object Schemas {

  /** Composite trajectory key (reference: bdb2026/config.py:4-6). */
  val trajectoryKeys: Seq[String] = Seq("game_id", "play_id", "nfl_id")
  val frameKeys: Seq[String] = trajectoryKeys :+ "frame_id"
  val playKeys: Seq[String] = Seq("game_id", "play_id")

  /** Pre-throw tracking: one row per player-frame (reference: cell 5 output,
    * 4.88 M rows × 23 cols). */
  val groupInput: StructType = StructType(Seq(
    StructField("game_id", LongType, nullable = false),
    StructField("play_id", LongType, nullable = false),
    StructField("player_to_predict", BooleanType),
    StructField("nfl_id", LongType, nullable = false),
    StructField("frame_id", LongType, nullable = false),
    StructField("play_direction", StringType),
    StructField("absolute_yardline_number", LongType),
    StructField("player_name", StringType),
    StructField("player_height", StringType),
    StructField("player_weight", LongType),
    StructField("player_birth_date", StringType),
    StructField("player_position", StringType),
    StructField("player_side", StringType),
    StructField("player_role", StringType),
    StructField("x", DoubleType),
    StructField("y", DoubleType),
    StructField("s", DoubleType),
    StructField("a", DoubleType),
    StructField("dir", DoubleType),
    StructField("o", DoubleType),
    StructField("num_frames_output", LongType),
    StructField("ball_land_x", DoubleType),
    StructField("ball_land_y", DoubleType)))

  /** Post-throw ground truth (reference: cell 7 output, 562 K rows × 6 cols). */
  val groupOutput: StructType = StructType(Seq(
    StructField("game_id", LongType, nullable = false),
    StructField("play_id", LongType, nullable = false),
    StructField("nfl_id", LongType, nullable = false),
    StructField("frame_id", LongType, nullable = false),
    StructField("x", DoubleType),
    StructField("y", DoubleType)))

  /** Play-context table (reference: cell 9 output, 18 K rows × 41 cols);
    * only the columns the pipeline consumes are declared individually — the
    * remainder keep their observed types. */
  val supplementary: StructType = StructType(Seq(
    StructField("game_id", LongType, nullable = false),
    StructField("play_id", LongType, nullable = false),
    StructField("season", LongType),
    StructField("week", LongType),
    StructField("game_date", StringType),
    StructField("quarter", LongType),
    StructField("down", LongType),
    StructField("yards_to_go", LongType),
    StructField("possession_team", StringType),
    StructField("defensive_team", StringType),
    StructField("play_description", StringType),
    StructField("pass_result", StringType),
    StructField("pass_length", LongType),
    StructField("offense_formation", StringType),
    StructField("receiver_alignment", StringType),
    StructField("route_of_targeted_receiver", StringType),
    StructField("play_action", BooleanType),
    StructField("dropback_type", StringType),
    StructField("dropback_distance", DoubleType),
    StructField("pass_location_type", StringType),
    StructField("defenders_in_the_box", LongType),
    StructField("team_coverage_man_zone", StringType),
    StructField("team_coverage_type", StringType),
    StructField("penalty_yards", LongType),
    StructField("pre_penalty_yards_gained", LongType),
    StructField("yards_gained", LongType),
    StructField("expected_points", DoubleType),
    StructField("expected_points_added", DoubleType),
    StructField("play_nullified_by_penalty", StringType)))

  /** Routes the route-clustering stage excludes (reference: preprocess.py:264-271). */
  val junkRoutes: Seq[String] = Seq("SCREEN", "FLAT", "ANGLE", "WHEEL", "SHIELD")
}
