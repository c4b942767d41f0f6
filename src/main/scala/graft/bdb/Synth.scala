package graft.bdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic tracking data shaped like the reference's base
  * tables (FIXTURES.md invariants: contiguous frame_id per trajectory, one
  * targeted receiver per play, constant ball_land/direction per play,
  * ~22 players/play). Generated distributed — `spark.range` then expressions,
  * no driver-side loops — so the same generator scales to stress tests.
  */
object Synth {

  /** @param nGames games; each game gets `playsPerGame` plays, 14 players
    *               tracked (7 offense incl. 1 targeted receiver, 7 defense),
    *               frame count varies 20-40 by play hash. */
  def tracking(spark: SparkSession, nGames: Int = 4, playsPerGame: Int = 25): DataFrame = {
    val players = 14
    val plays = spark.range(0, nGames.toLong * playsPerGame)
      .select(
        (col("id") / playsPerGame + 1).cast("long").as("game_id"),
        (col("id") % playsPerGame + 1).cast("long").as("play_id"))
      .withColumn("n_frames", (pmod(hash(col("game_id"), col("play_id")), lit(21)) + 20))
      .withColumn("play_direction",
        when(pmod(hash(col("play_id")), lit(2)) === 0, "left").otherwise("right"))
      .withColumn("ball_land_x", lit(40.0) +
        pmod(hash(col("game_id"), col("play_id"), lit(1)), lit(400)) / 10.0)
      .withColumn("ball_land_y", lit(10.0) +
        pmod(hash(col("game_id"), col("play_id"), lit(2)), lit(330)) / 10.0)

    val withPlayers = plays
      .crossJoin(spark.range(1, players + 1).select(col("id").as("pidx")))
      .withColumn("nfl_id", col("game_id") * 100 + col("pidx"))
      .withColumn("player_side", when(col("pidx") <= 7, "Offense").otherwise("Defense"))
      .withColumn("player_role",
        when(col("pidx") === 1, "Targeted Receiver")
          .when(col("pidx") <= 7, "Other Route Runner")
          .otherwise("Defensive Coverage"))
      .withColumn("player_to_predict", col("pidx") === 1)
      .withColumn("player_position",
        when(col("pidx") === 1, "WR").when(col("pidx") <= 7, "TE").otherwise("CB"))
      .withColumn("player_name", concat(lit("Player "), col("nfl_id")))

    withPlayers
      .withColumn("frame_id", explode(sequence(lit(1L), col("n_frames"))))
      // starting spot + per-frame drift toward the landing point, jittered by hash
      .withColumn("x0", lit(20.0) + pmod(hash(col("nfl_id"), col("play_id")), lit(200)) / 10.0)
      .withColumn("y0", lit(5.0) + pmod(hash(col("nfl_id"), col("game_id")), lit(430)) / 10.0)
      .withColumn("prog", col("frame_id") / col("n_frames"))
      .withColumn("x", col("x0") + (col("ball_land_x") - col("x0")) * col("prog") * 0.8)
      .withColumn("y", col("y0") + (col("ball_land_y") - col("y0")) * col("prog") * 0.8)
      .withColumn("s",
        abs(pmod(hash(col("nfl_id"), col("frame_id")), lit(90))) / 10.0)
      .withColumn("a", lit(0.0))
      .withColumn("dir",
        pmod(degrees(atan2(col("ball_land_x") - col("x"), col("ball_land_y") - col("y"))),
          lit(360.0)))
      .withColumn("o", col("dir"))
      // remaining reference columns (FIXTURES.md §1) so the frame matches
      // Schemas.groupInput exactly
      .withColumn("absolute_yardline_number",
        (pmod(hash(col("play_id"), lit(7)), lit(99)) + 1).cast("long"))
      .withColumn("player_height",
        concat(lit("6-"), pmod(hash(col("nfl_id")), lit(6))))
      .withColumn("player_weight",
        (pmod(hash(col("nfl_id"), lit(8)), lit(80)) + 180).cast("long"))
      .withColumn("player_birth_date",
        concat(lit("199"), pmod(hash(col("nfl_id"), lit(9)), lit(10)), lit("-06-15")))
      .withColumn("num_frames_output",
        (pmod(hash(col("game_id"), col("play_id"), lit(10)), lit(20)) + 5).cast("long"))
      .select("game_id", "play_id", "player_to_predict", "nfl_id", "frame_id",
        "play_direction", "absolute_yardline_number", "player_name",
        "player_height", "player_weight", "player_birth_date",
        "player_position", "player_side", "player_role",
        "x", "y", "s", "a", "dir", "o",
        "num_frames_output", "ball_land_x", "ball_land_y")
  }

  /** Post-throw ground truth for targeted receivers: actual path converging on
    * the landing point (so converge-rate labels are meaningful). */
  def output(tracking: DataFrame): DataFrame =
    tracking.filter(col("player_role") === "Targeted Receiver")
      .select(col("game_id"), col("play_id"), col("nfl_id"), col("frame_id"),
        col("x"), col("y"))

  /** Play-context rows: pass_result cycles C/C/I/IN, routes cycle through a
    * fixed list incl. junk routes for the P4 filter. */
  def supplementary(tracking: DataFrame): DataFrame = {
    val routes = array(Seq("GO", "POST", "OUT", "SLANT", "CROSS", "HITCH",
      "CORNER", "SCREEN", "FLAT").map(lit): _*)
    tracking.select("game_id", "play_id").distinct()
      .withColumn("pass_result",
        when(pmod(hash(col("game_id"), col("play_id"), lit(3)), lit(4)) <= 1, "C")
          .when(pmod(hash(col("game_id"), col("play_id"), lit(3)), lit(4)) === 2, "I")
          .otherwise("IN"))
      .withColumn("route_of_targeted_receiver",
        element_at(routes, (pmod(hash(col("game_id"), col("play_id"), lit(4)), lit(9)) + 1)
          .cast("int")))
      .withColumn("yards_gained",
        pmod(hash(col("game_id"), col("play_id"), lit(5)), lit(35)).cast("long"))
      .withColumn("expected_points_added",
        pmod(hash(col("game_id"), col("play_id"), lit(6)), lit(100)) / 20.0 - 2.0)
  }
}
