package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeparationSpec extends SparkSpec {

  private def normalized = Normalize.notebookStyle(Fixtures.simplePlay(spark))

  test("initial separation at throw frame = distance to nearest defender") {
    val sep = Separation.initialSeparationAtThrow(normalized)
    val row = sep.head()
    // throw frame 5: receiver (55,30), defender (53,31) → sqrt(4+1)
    assert(row.getAs[Long]("nfl_id") === 10L)
    assert(math.abs(row.getAs[Double]("initial_separation") - math.sqrt(5.0)) < 1e-12)
    assert(sep.count() === 1)
  }

  test("nearest defender per frame matches brute force") {
    val recv = normalized.filter(col("player_role") === "Targeted Receiver")
    val defs = normalized.filter(col("player_side") === "Defense")
    val perFrame = Separation.nearestDefenderPerFrame(recv, defs)
      .orderBy("frame_id")
      .select("defender_separation")
      .collect().map(_.getDouble(0))
    // every frame: dx = 2, dy = -1 → sqrt(5)
    assert(perFrame.length === 5)
    assert(perFrame.forall(d => math.abs(d - math.sqrt(5.0)) < 1e-12))
  }

  test("catchSeparation: last-frame nearest defender for every offensive player") {
    val sep = Separation.catchSeparation(normalized)
    val rows = sep.collect()
    assert(rows.length === 1) // one offensive player in the fixture
    // catch frame 5: receiver (55,30) vs defender (53,31) → sqrt(5)
    assert(math.abs(rows.head.getAs[Double]("sep_at_catch") - math.sqrt(5.0)) < 1e-12)
    // no defenders → 10.0 wide-open cap
    val noDef = Separation.catchSeparation(
      normalized.filter(col("player_side") === "Offense"))
    assert(noDef.head().getAs[Double]("sep_at_catch") === 10.0)
  }

  test("attachSeparation fills missing with the 20.0 wide-open default") {
    val recv = normalized.filter(col("player_role") === "Targeted Receiver")
    val sepMissing = Separation.nearestDefenderPerFrame(recv, normalized
      .filter(col("player_side") === "Defense"))
      .filter(col("frame_id") <= 2) // drop frames 3..5
    val attached = Separation.attachSeparation(
      recv.select("game_id", "play_id", "nfl_id", "frame_id"), sepMissing)
    val byFrame = attached.orderBy("frame_id")
      .select("defender_separation").collect().map(_.getDouble(0))
    assert(math.abs(byFrame(0) - math.sqrt(5.0)) < 1e-12)
    assert(byFrame.drop(2).forall(_ === 20.0))
  }
}
