package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequenceFeaturesSpec extends SparkSpec {
  import spark.implicits._

  // one trajectory, dist shrinking 10,8,7,3; s/dir_change/time constant-ish
  private def frames() = Seq(
    (1L, 1L, 1L, 1L, 10.0, 2.0, 0.0, 0.0, 9.0),
    (1L, 1L, 1L, 2L, 8.0, 4.0, 10.0, 0.1, 7.5),
    (1L, 1L, 1L, 3L, 7.0, 6.0, 20.0, 0.2, 7.0),
    (1L, 1L, 1L, 4L, 3.0, 8.0, 30.0, 0.3, 6.0))
    .toDF("game_id", "play_id", "nfl_id", "frame_id",
      "dist_to_ball", "s", "dir_change", "time_since_start",
      "defender_separation")

  test("lagged closing rates: exact values, zero-filled head") {
    val out = SequenceFeatures.add(frames()).orderBy("frame_id")
      .select("closing_rate_lag", "closing_rate_lag2", "sep_closing_lag")
      .as[(Double, Double, Double)].collect()
    assert(out(0) === ((0.0, 0.0, 0.0))) // head: no past → fillna(0)
    assert(out(1) === ((2.0, 0.0, 1.5))) // 10-8, lag2 missing, 9-7.5
    assert(out(2) === ((1.0, 2.0, 0.5)))
    assert(out(3) === ((4.0, 1.0, 1.0)))
  }

  test("ewma weights sum to 1: constant series is a fixed point") {
    val const = Seq.tabulate(6)(i =>
      (1L, 1L, 1L, i.toLong + 1, 5.0, 3.0, 0.0, i * 0.1, 2.0))
      .toDF("game_id", "play_id", "nfl_id", "frame_id",
        "dist_to_ball", "s", "dir_change", "time_since_start",
        "defender_separation")
    val out = SequenceFeatures.add(const)
      .select("speed_ewma").as[Double].collect()
    out.foreach(v => assert(math.abs(v - 3.0) < 1e-12))
  }

  test("strictly past-only: editing FUTURE frames never changes a feature") {
    // the leakage property the label demands (converge_rate looks ahead):
    // perturb every frame after t=2 and assert rows 1..2 are bit-identical
    val base = SequenceFeatures.add(frames())
      .filter(col("frame_id") <= 2).orderBy("frame_id")
      .select(SequenceFeatures.cols.map(col): _*).collect()
    val perturbed = frames().withColumn("dist_to_ball",
        when(col("frame_id") > 2, col("dist_to_ball") * 3 + 1)
          .otherwise(col("dist_to_ball")))
      .withColumn("s",
        when(col("frame_id") > 2, lit(99.0)).otherwise(col("s")))
    val got = SequenceFeatures.add(perturbed)
      .filter(col("frame_id") <= 2).orderBy("frame_id")
      .select(SequenceFeatures.cols.map(col): _*).collect()
    assert(got.toSeq === base.toSeq)
  }

  test("trajectories are independent: a second trajectory's head is clean") {
    val two = frames().union(
      Seq((1L, 1L, 2L, 1L, 100.0, 1.0, 0.0, 0.0, 50.0),
          (1L, 1L, 2L, 2L, 90.0, 1.0, 0.0, 0.1, 40.0))
        .toDF("game_id", "play_id", "nfl_id", "frame_id",
          "dist_to_ball", "s", "dir_change", "time_since_start",
          "defender_separation"))
    val out = SequenceFeatures.add(two)
      .filter(col("nfl_id") === 2).orderBy("frame_id")
      .select("closing_rate_lag").as[Double].collect()
    assert(out.toSeq === Seq(0.0, 10.0)) // head sees nothing of nfl_id=1
  }

  test("without a separation column, sep_closing_lag is a 0.0 constant") {
    val out = SequenceFeatures.add(frames().drop("defender_separation"))
      .select("sep_closing_lag").as[Double].collect()
    assert(out.forall(_ === 0.0))
  }

  test("plan: both feature passes share one exchange on the trajectory keys") {
    val df = SequenceFeatures.add(frames())
    val exchanges = df.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges")
  }
}
