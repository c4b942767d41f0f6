package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {

  private def hofHash = expr(
    "aggregate(transform(sequence(1, length(t)), i -> ascii(substring(t, i, 1))), " +
      "0L, (x, c) -> (x * 31 + c) % 2147483647)")

  test("native expression matches the HOF formulation exactly") {
    import spark.implicits._
    val df = Seq("hello", "a", "", "spark sql", "中文字符", "mixed 中 text")
      .toDF("t")
    val both = df.select(
      GraftFunctions.rolling_hash(col("t")).as("native"), hofHash.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("registered in SQL via GraftExtensions") {
    import spark.implicits._
    Seq(("doc one", 1L)).toDF("t", "id").createOrReplaceTempView("rh_test")
    val viaSql = spark.sql("SELECT rolling_hash(t) AS h FROM rh_test")
      .head().getLong(0)
    val viaApi = Seq("doc one").toDF("t")
      .select(GraftFunctions.rolling_hash(col("t"))).head().getLong(0)
    assert(viaSql === viaApi)
    assert(viaSql > 0L)
  }

  test("null-safe and deterministic") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("t")
    val out = df.select(GraftFunctions.rolling_hash(col("t")).as("h"))
      .collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
    // known value: "a" → 97
    assert(Seq("a").toDF("t").select(GraftFunctions.rolling_hash(col("t")))
      .head().getLong(0) === 97L)
  }
}
