package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FloatDotSpec extends SparkSpec {

  private val hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "0.0D, (acc, p) -> acc + p)")

  test("native expression is bit-identical to the HOF sequential fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("a", "b")
    val both = df.select(
      GraftFunctions.float_dot(col("a"), col("b")).as("native"), hofDot.as("hof"))
    // exact double equality, not tolerance: the accumulation order is the contract
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("norm form, SQL registration, null safety, known value") {
    import spark.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(GraftFunctions.float_dot(col("a"), col("a")))
      .head().getDouble(0) === 25.0)
    assert(df.select(GraftFunctions.float_dot(col("a"), col("b")))
      .head().getDouble(0) === 11.0)
    df.createOrReplaceTempView("fd_test")
    assert(spark.sql("SELECT float_dot(a, b) FROM fd_test").head().getDouble(0) === 11.0)
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(withNull.select(GraftFunctions.float_dot(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("length mismatch fails loudly") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftFunctions.float_dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }
}
