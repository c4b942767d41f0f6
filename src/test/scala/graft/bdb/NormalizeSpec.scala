package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {

  test("right-direction plays are unchanged") {
    val df = Normalize.notebookStyle(Fixtures.simplePlay(spark, direction = "right"))
    val bad = df.filter(col("x_norm") =!= col("x") || col("y_norm") =!= col("y") ||
      col("dir_norm") =!= col("dir")).count()
    assert(bad === 0)
  }

  test("left-direction plays flip x, y, and angles (notebook semantics)") {
    val df = Normalize.notebookStyle(Fixtures.simplePlay(spark, direction = "left"))
    val row = df.filter(col("nfl_id") === 10 && col("frame_id") === 1)
      .select("x_norm", "y_norm", "dir_norm", "ball_land_x_norm").head()
    assert(row.getDouble(0) === 120.0 - 51.0)
    assert(math.abs(row.getDouble(1) - (53.3 - 30.0)) < 1e-12)
    assert(row.getDouble(2) === 270.0) // 90 + 180 mod 360
    assert(row.getDouble(3) === 60.0) // 120 - 60
  }

  test("double flip is identity (flip-invariance property, SURVEY §5)") {
    // Flipping a left play yields coordinates that, flipped again, return the
    // original: apply notebookStyle, rebuild a frame with flipped raw cols and
    // direction 'left' again, re-normalize, compare to raw.
    val original = Fixtures.simplePlay(spark, direction = "left")
    val once = Normalize.notebookStyle(original)
    val again = Normalize.notebookStyle(
      once.drop("x", "y", "dir", "o", "ball_land_x", "ball_land_y")
        .withColumnRenamed("x_norm", "x").withColumnRenamed("y_norm", "y")
        .withColumnRenamed("dir_norm", "dir").withColumnRenamed("o_norm", "o")
        .withColumnRenamed("ball_land_x_norm", "ball_land_x")
        .withColumnRenamed("ball_land_y_norm", "ball_land_y"))
    val joined = original.select(col("nfl_id"), col("frame_id"), col("x"), col("dir"))
      .join(again.select(col("nfl_id"), col("frame_id"),
        col("x_norm").as("x2"), col("dir_norm").as("dir2")), Seq("nfl_id", "frame_id"))
    val bad = joined.filter(abs(col("x") - col("x2")) > 1e-9 ||
      abs(col("dir") - col("dir2")) > 1e-9).count()
    assert(bad === 0)
  }

  test("scaleTo100: bounds and degenerate case") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val scaled = Normalize.scaleTo100(df, "v", "v100").orderBy("v")
      .select("v100").as[Double].collect()
    assert(scaled.toSeq === Seq(0.0, 50.0, 100.0))
    val degen = Seq(7.0, 7.0).toDF("v")
    val d = Normalize.scaleTo100(degen, "v", "v100")
      .select("v100").as[Double].collect()
    assert(d.toSeq === Seq(50.0, 50.0))
  }
}
