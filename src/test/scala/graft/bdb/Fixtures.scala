package graft.bdb

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tiny in-memory tracking fixtures shaped like the reference's base tables
  * (FIXTURES.md §1): enough structure for every operator, small enough to
  * hand-verify.
  */
object Fixtures {

  final case class Frame(
      game_id: Long, play_id: Long, nfl_id: Long, frame_id: Long,
      play_direction: String, player_side: String, player_role: String,
      player_name: String, player_position: String,
      x: Double, y: Double, s: Double, a: Double, dir: Double, o: Double,
      ball_land_x: Double, ball_land_y: Double)

  /** One play, one receiver moving +1 yd x per frame, one defender trailing,
    * right-direction (no flip). Ball lands at (60, 30). */
  def simplePlay(spark: SparkSession, gameId: Long = 1L, playId: Long = 1L,
      direction: String = "right", nFrames: Int = 5): DataFrame = {
    import spark.implicits._
    val recv = (1 to nFrames).map { f =>
      Frame(gameId, playId, 10L, f, direction, "Offense", "Targeted Receiver",
        "Rec One", "WR", 50.0 + f, 30.0, 1.0, 0.0, 90.0, 90.0, 60.0, 30.0)
    }
    val defd = (1 to nFrames).map { f =>
      Frame(gameId, playId, 20L, f, direction, "Defense", "Defensive Coverage",
        "Def One", "CB", 48.0 + f, 31.0, 1.0, 0.0, 90.0, 90.0, 60.0, 30.0)
    }
    (recv ++ defd).toDF()
  }

  final case class Supp(game_id: Long, play_id: Long, pass_result: String,
      route_of_targeted_receiver: String, yards_gained: Long,
      expected_points_added: Double)

  def supp(spark: SparkSession, rows: Seq[Supp]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }
}
