package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FloatL2SqSpec extends SparkSpec {

  private val hofL2 = expr(
    "aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
      "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0.0D, (acc, p) -> acc + p)")

  test("native expression is bit-identical to the HOF sequential fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("a", "b")
    val both = df.select(
      GraftFunctions.float_l2sq(col("a"), col("b")).as("native"), hofL2.as("hof"))
    // exact double equality, not tolerance: the accumulation order is the contract
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("mixed float/double sides match the cast HOF (the centroid-probe shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 100).map { _ =>
      (Array.fill(16)(rnd.nextFloat() * 2 - 1),
        Array.fill(16)(rnd.nextDouble() * 2 - 1))
    }.toDF("a", "b")
    val hofMixed = expr(
      "aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), b, (x, c) -> (x - c) * (x - c)), " +
        "0.0D, (acc, p) -> acc + p)")
    val both = df.select(
      GraftFunctions.float_l2sq(col("a"), col("b")).as("native"),
      GraftFunctions.float_l2sq(col("b"), col("a")).as("flipped"),
      hofMixed.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.filter(col("flipped") =!= col("hof")).count() === 0)
  }

  test("SQL registration, null safety, known value, length mismatch") {
    import spark.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(GraftFunctions.float_l2sq(col("a"), col("b")))
      .head().getDouble(0) === 8.0)
    assert(df.select(GraftFunctions.float_l2sq(col("a"), col("a")))
      .head().getDouble(0) === 0.0)
    df.createOrReplaceTempView("fl2_test")
    assert(spark.sql("SELECT float_l2sq(a, b) FROM fl2_test").head().getDouble(0) === 8.0)
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(withNull.select(GraftFunctions.float_l2sq(col("a"), col("b")))
      .head().isNullAt(0))
    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.float_l2sq(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }
}
