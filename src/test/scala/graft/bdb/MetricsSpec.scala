package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  test("trueSpeedPerPlay residual rollup: mean/median/mae/rmse") {
    import spark.implicits._
    val residuals = Seq(
      (1L, 1L, 10L, 1L, 0.2), (1L, 1L, 10L, 2L, -0.2), (1L, 1L, 10L, 3L, 0.6))
      .toDF("game_id", "play_id", "nfl_id", "frame_id", "residual")
    val r = Metrics.trueSpeedPerPlay(residuals).head()
    assert(math.abs(r.getAs[Double]("residual_mean") - 0.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("residual_median") - 0.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("residual_mae") - (1.0 / 3)) < 1e-12)
    assert(math.abs(r.getAs[Double]("residual_rmse")
      - math.sqrt((0.04 + 0.04 + 0.36) / 3)) < 1e-12)
    assert(r.getAs[Long]("n_frames") === 3L)
  }

  test("scorecard: production aggs, volume HAVING filter, rank") {
    import spark.implicits._
    // player 1: 4 targets, player 2: 4, player 3: 1 (filtered at 0.5*4)
    val plays = Seq(
      (10L, "A", "C", 25L, 1.0, 0.4), (10L, "A", "C", 10L, 0.5, 0.2),
      (10L, "A", "I", 0L, -0.5, 0.0), (10L, "A", "C", 30L, 2.0, 0.2),
      (20L, "B", "C", 5L, 0.2, -0.1), (20L, "B", "I", 0L, -0.3, 0.1),
      (20L, "B", "I", 0L, -0.4, -0.2), (20L, "B", "C", 8L, 0.1, 0.0),
      (30L, "C", "C", 50L, 3.0, 9.9)) // extreme residual, must NOT stretch the scale
      .toDF("nfl_id", "player_name", "pass_result", "yards_gained",
        "expected_points_added", "residual_mean")
    val sc = Metrics.scorecard(plays).orderBy("rank")
    val rows = sc.collect()
    assert(rows.length === 2) // player 30 fails the volume filter
    assert(rows(0).getAs[String]("player_name") === "A")
    assert(rows(0).getAs[Long]("explosive_plays") === 2L) // 25, 30
    assert(math.abs(rows(0).getAs[Double]("catch_rate") - 0.75) < 1e-12)
    assert(rows(0).getAs[Int]("rank") === 1)
    assert(rows(1).getAs[Int]("rank") === 2)
    // 0-100 scale spans the QUALIFIED subset only (metrics.py:327-344
    // ordering): A (best of the two) pegs 100, B pegs 0 — player C's 9.9
    // residual was filtered out before normalization so it can't compress
    // the survivors toward 0.
    assert(rows(0).getAs[Double]("true_speed") === 100.0)
    assert(rows(1).getAs[Double]("true_speed") === 0.0)
  }

  test("scorecard: junk routes are excluded before scoring and production") {
    import spark.implicits._
    val plays = Seq(
      // player A: 3 real targets + 2 SCREEN (junk) — production must count 3
      (10L, "A", "GO", "C", 25L, 1.0, 0.4),
      (10L, "A", "POST", "C", 10L, 0.5, 0.2),
      (10L, "A", "OUT", "I", 0L, -0.5, 0.0),
      (10L, "A", "SCREEN", "C", 40L, 3.0, 5.0),
      (10L, "A", "SCREEN", "C", 35L, 2.5, 5.0),
      // player B: 3 real targets
      (20L, "B", "GO", "C", 5L, 0.2, -0.1),
      (20L, "B", "CROSS", "I", 0L, -0.3, 0.1),
      (20L, "B", "HITCH", "C", 8L, 0.1, 0.0))
      .toDF("nfl_id", "player_name", "route_of_targeted_receiver",
        "pass_result", "yards_gained", "expected_points_added", "residual_mean")
    val rows = Metrics.scorecard(plays).orderBy("rank").collect()
    assert(rows.length === 2)
    val a = rows.find(_.getAs[String]("player_name") == "A").get
    assert(a.getAs[Long]("total_targets") === 3L) // SCREENs dropped
    assert(a.getAs[Long]("explosive_plays") === 1L) // 40/35-yd screens dropped
    assert(a.getAs[Long]("plays_scored") === 3L) // junk excluded from process too
  }

  test("hybridAirPlayIq: bounded to [0, 100], contested scores amplified") {
    import spark.implicits._
    val df = Seq(
      (0.5, 0.2),  // tight coverage, positive residual → amplified
      (5.0, 0.2),  // open
      (0.5, -2.0), // terrible → clamps at 0
      (5.0, 2.0))  // great → clamps at 100
      .toDF("defender_separation", "residual_mean")
    val iq = Metrics.hybridAirPlayIq(df).select("air_play_iq")
      .as[Double].collect()
    assert(iq.forall(v => v >= 0.0 && v <= 100.0))
    assert(iq(0) > iq(1)) // same residual scores higher when contested
    assert(iq(2) === 0.0)
    assert(iq(3) === 100.0)
  }

  test("archetypes: percentile buckets assign expected labels") {
    import spark.implicits._
    val scored = (1 to 20).map { i =>
      (i.toLong, i * 5.0, i.toLong * 2, i * 1.5)
    }.toDF("nfl_id", "true_speed", "total_targets", "yards_per_target")
    val a = Metrics.archetypes(scored)
    val top = a.filter(col("nfl_id") === 20).head().getAs[String]("archetype")
    val bottom = a.filter(col("nfl_id") === 1).head().getAs[String]("archetype")
    assert(top === "Elite Separator")
    assert(bottom === "Depth Piece")
  }

  test("routeExecutionPerPlayer: mean IQ scaled 0-100, rounded to 1dp") {
    import spark.implicits._
    val iq = Seq(
      (10L, 1.0), (10L, 0.0), // mean 0.5
      (20L, -1.0), (20L, -2.0), // mean -1.5 (worst → 0)
      (30L, 2.0), (30L, 2.0)) // mean 2.0 (best → 100)
      .toDF("nfl_id", "route_exec_iq")
    val out = Metrics.routeExecutionPerPlayer(iq)
      .orderBy("nfl_id").select("route_execution").as[Double].collect()
    assert(out(2) === 100.0)
    assert(out(1) === 0.0)
    assert(out(0) > 0.0 && out(0) < 100.0)
    assert(out(0) === math.rint(out(0) * 10) / 10) // 1 dp
  }

  test("modelBeaters: top-k by mean residual with a volume floor") {
    import spark.implicits._
    val perPlay = (1 to 30).map { i =>
      val player = i % 3 + 10L // players 10, 11, 12 with 10 plays each
      (1L, i.toLong, player, (player - 11L).toDouble / 10) // 12 beats most
    }.toDF("game_id", "play_id", "nfl_id", "residual_mean")
    val top = Metrics.modelBeaters(perPlay, k = 2).collect()
    assert(top.length === 2)
    assert(top(0).getAs[Long]("nfl_id") === 12L)
    assert(top(1).getAs[Long]("nfl_id") === 11L)
    // volume floor excludes thin samples
    val thin = Metrics.modelBeaters(perPlay.limit(4), k = 5, minPlays = 5)
    assert(thin.count() === 0)
  }

  test("topPlayerPerRoute picks the argmax per route") {
    import spark.implicits._
    val pr = Seq(
      ("GO", 10L, 0.9), ("GO", 11L, 0.7), ("OUT", 12L, 0.5), ("OUT", 13L, 0.8))
      .toDF("route_of_targeted_receiver", "nfl_id", "score")
    val top = Metrics.topPlayerPerRoute(pr, "score")
      .orderBy("route_of_targeted_receiver")
      .select("nfl_id").as[Long].collect()
    assert(top.toSeq === Seq(10L, 13L))
  }
}
