package graft.operators

import graft.SparkSpec

class JoinsSpec extends SparkSpec {

  test("onCommonKeys resolves the key intersection at plan-build time (J9)") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L, 1.0), (1L, 2L, 11L, 2.0))
      .toDF("game_id", "play_id", "nfl_id", "v")
    val rightPlayLevel = Seq((1L, 1L, "C"), (1L, 2L, "I"))
      .toDF("game_id", "play_id", "pass_result")
    val candidates = Seq("game_id", "play_id", "nfl_id", "frame_id")
    val joined = Joins.onCommonKeys(left, rightPlayLevel, candidates)
    assert(joined.count() === 2)
    assert(joined.columns.count(_ == "game_id") === 1) // keys deduplicated
    val noKeys = Seq((1, "x")).toDF("other", "y")
    intercept[IllegalArgumentException] {
      Joins.onCommonKeys(left, noKeys, candidates)
    }
  }
}
