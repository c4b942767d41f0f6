package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KinematicsSpec extends SparkSpec {

  private def normalized = Normalize.notebookStyle(Fixtures.simplePlay(spark))

  test("velocity from lag-diff: +1 yd / 0.1 s = 10 yd/s, first frame 0") {
    val v = Kinematics.addVelocity(normalized)
      .filter(col("nfl_id") === 10).orderBy("frame_id")
      .select("vx", "vy").collect()
    assert(v.head.getDouble(0) === 0.0)
    assert(v.tail.forall(r => math.abs(r.getDouble(0) - 10.0) < 1e-9))
    assert(v.forall(r => r.getDouble(1) === 0.0))
  }

  test("ball geometry: distance shrinks as receiver approaches landing point") {
    val g = Kinematics.addBallGeometry(normalized)
      .filter(col("nfl_id") === 10).orderBy("frame_id")
      .select("dist_to_ball").as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect()
    assert(g.toSeq === Seq(9.0, 8.0, 7.0, 6.0, 5.0))
  }

  test("bearing: straight +x movement toward ball is 90° compass") {
    val b = Kinematics.addBallGeometry(normalized)
      .filter(col("nfl_id") === 10 && col("frame_id") === 1)
      .select("bearing_to_ball_deg", "heading_align_cos").head()
    assert(math.abs(b.getDouble(0) - 90.0) < 1e-9)
    assert(math.abs(b.getDouble(1) - 1.0) < 1e-9) // dir 90 == bearing 90
  }

  test("frame index and elapsed time") {
    val f = Kinematics.addFrameIndex(normalized)
      .filter(col("nfl_id") === 10).orderBy("frame_id")
      .select("frame_since_start", "time_since_start").collect()
    assert(f.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    assert(math.abs(f.last.getDouble(1) - 0.4) < 1e-12)
  }

  test("angle diff wraps at 360") {
    import spark.implicits._
    val df = Seq((350.0, 10.0), (10.0, 350.0), (180.0, 0.0)).toDF("a", "b")
    val d = df.select(Kinematics.angleDiff(col("a"), col("b")).as("d"))
      .as[Double].collect()
    assert(d.toSeq === Seq(20.0, 20.0, 180.0))
  }
}
