package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelsSpec extends SparkSpec {

  private def withGeometry =
    Kinematics.addBallGeometry(Normalize.notebookStyle(Fixtures.simplePlay(spark)))
      .filter(col("player_role") === "Targeted Receiver")

  test("converge rate (notebook style): dist[t] - dist[t+1], last = 0") {
    val rates = Labels.addConvergeRate(withGeometry)
      .orderBy("frame_id").select("converge_rate")
      .collect().map(_.getDouble(0))
    assert(rates.toSeq === Seq(1.0, 1.0, 1.0, 1.0, 0.0))
  }

  test("telescoping property: sum of rates = dist[first] - dist[last] (SURVEY §5)") {
    val df = Labels.addConvergeRate(withGeometry)
    val total = df.agg(sum("converge_rate")).head().getDouble(0)
    val ends = df.orderBy("frame_id").select("dist_to_ball").collect()
    assert(math.abs(total - (ends.head.getDouble(0) - ends.last.getDouble(0))) < 1e-9)
  }

  test("package-style variant: yd/s scale, first frame 0") {
    val rates = Labels.addConvergeRatePackageStyle(withGeometry)
      .orderBy("frame_id").select("converge_rate_yps")
      .collect().map(_.getDouble(0))
    assert(rates.head === 0.0)
    assert(rates.tail.forall(r => math.abs(r - 10.0) < 1e-9)) // 1 yd/frame / 0.1
  }

  test("attachOutputLabels: 4-col inner join, fail-loud on empty") {
    import spark.implicits._
    val out = Seq((1L, 1L, 10L, 1L, 51.5, 30.5)).toDF(
      "game_id", "play_id", "nfl_id", "frame_id", "x", "y")
    val labeled = Labels.attachOutputLabels(withGeometry, out)
    assert(labeled.count() === 1)
    assert(labeled.head().getAs[Double]("label_x") === 51.5)
    val empty = Seq((9L, 9L, 9L, 9L, 0.0, 0.0)).toDF(
      "game_id", "play_id", "nfl_id", "frame_id", "x", "y")
    intercept[IllegalStateException] {
      Labels.attachOutputLabels(withGeometry, empty)
    }
  }

  test("completed-pass semi-join keeps only pass_result == 'C' plays") {
    val supp = Fixtures.supp(spark, Seq(
      Fixtures.Supp(1L, 1L, "C", "GO", 12L, 0.5),
      Fixtures.Supp(1L, 2L, "I", "OUT", 0L, -0.7)))
    val kept = Labels.filterToCompletedPasses(withGeometry, supp)
    assert(kept.count() === withGeometry.count())
    val none = Labels.filterToCompletedPasses(
      withGeometry.withColumn("play_id", lit(2L)), supp)
    assert(none.count() === 0)
  }
}
