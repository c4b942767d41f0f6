package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The order-statistics operator must reproduce Spark's builtin exact
  * `percentile` aggregate bit-for-bit wherever the builtin can run at all
  * (the operator exists because the builtin cannot run at scale — its
  * per-task value→count map OOMs; see Percentiles' scaladoc).
  */
class PercentilesSpec extends SparkSpec {

  private def builtin(df: org.apache.spark.sql.DataFrame, g: String,
      v: String, qs: Seq[Double]): Map[(String, Double), Double] =
    qs.flatMap { q =>
      df.groupBy(col(g).cast("string").as("g"))
        .agg(expr(s"percentile($v, $q)").as("p"))
        .collect()
        .filter(r => !r.isNullAt(1))
        .map(r => (r.getString(0), q) -> r.getDouble(1))
    }.toMap

  private def ours(df: org.apache.spark.sql.DataFrame, g: String, v: String,
      qs: Seq[Double]): Map[(String, Double), Double] =
    Percentiles.exactByGroup(df, g, v, qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap

  test("matches the builtin exactly on lineitem at every tested quantile") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val expected = builtin(li, "l_returnflag", "l_extendedprice", qs)
    val got = ours(li, "l_returnflag", "l_extendedprice", qs)
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, x) => assert(x == expected(k), s"at $k") }
  }

  test("handles ties, single-row groups, null values, and null group keys") {
    import spark.implicits._
    val df = Seq[(Option[String], Option[Double])](
      (Some("a"), Some(1.0)), (Some("a"), Some(1.0)), (Some("a"), Some(1.0)),
      (Some("a"), Some(2.0)), (Some("a"), None),
      (Some("b"), Some(42.0)),
      (None, Some(5.0)), (None, Some(7.0))
    ).toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.75)
    val got = ours(df, "g", "v", qs)
    val expected = builtin(df, "g", "v", qs)
    // builtin drops the null-key group from this helper only if percentile
    // returned null; GROUP BY keeps null keys in both engines
    assert(got.keySet == expected.keySet ++ qs.map(q => (null: String, q)))
    expected.foreach { case (k, x) => assert(got(k) == x, s"at $k") }
    // null group key: values {5, 7} -> p50 = 6.0 by interpolation
    assert(got((null, 0.5)) == 6.0)
    assert(got((null, 0.25)) == 5.5)
    // single-row group: every quantile is the value
    qs.foreach(q => assert(got(("b", q)) == 42.0))
  }

  test("empty input and all-null values yield an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Percentiles.exactByGroup(empty, "g", "v", Seq(0.5)).count() == 0)
    val allNull = Seq(("a", Option.empty[Double])).toDF("g", "v")
    assert(Percentiles.exactByGroup(allNull, "g", "v", Seq(0.5)).count() == 0)
  }

  test("a group spanning many range partitions still ranks globally") {
    import spark.implicits._
    // one huge group forced across 8 partitions: the window form would
    // collapse this to a single task; the operator must not
    val n = 10000
    val df = (1 to n).map(i => ("big", i.toDouble)).toDF("g", "v")
    val got = Percentiles.exactByGroup(df, "g", "v", Seq(0.5, 0.99), partitions = 8)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(got(0.5) == (1 + n) / 2.0)
    assert(got(0.99) == Percentiles.interpolate(n, 0.99, i => (i + 1).toDouble))
  }

  test("the group column keeps its input DataType (r15 ADVICE)") {
    import spark.implicits._
    val df = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("g", "v")
    val out = Percentiles.exactByGroup(df, "g", "v", Seq(0.5))
    assert(out.schema("g").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val got = out.collect().map(r => (r.getInt(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got((1, 0.5)) == 15.0 && got((2, 0.5)) == 5.0)
  }

  test("refuses above maxGroups with an actionable error (eagerness contract)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, i.toDouble)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Percentiles.exactByGroup(df, "g", "v", Seq(0.5), maxGroups = 10)
    }
    assert(e.getMessage.contains("ranked"))
  }

  test("ranked/medianAgg ignore nulls like the builtin (r15 ADVICE)") {
    import spark.implicits._
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(2.0)),
      ("b", None), ("b", None), // all-null group -> null median
      ("c", Some(4.0)), ("c", Some(6.0))
    ).toDF("g", "v")
    val got = Percentiles.ranked(df, Seq("g"), "v")
      .groupBy("g").agg(Percentiles.medianAgg("v").as("med"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got("a") == Some(2.0)) // null ignored: median of {1,2,3}
    assert(got("b") == None)
    assert(got("c") == Some(5.0))
    // and with no nulls the columns are bit-identical to the r15 form
    val clean = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val r = Percentiles.ranked(clean, Seq("g"), "v")
      .orderBy("v").collect()
    assert(r.map(_.getAs[Long]("__rn")).toSeq == Seq(1L, 2L))
    assert(r.map(_.getAs[Long]("__nn")).toSeq == Seq(2L, 2L))
  }

  test("interpolate reproduces percentile_cont arithmetic") {
    def at(s: Double*): Long => Double = i => s(i.toInt)
    // n=4, q=0.5 -> pos=1.5 -> midpoint of ranks 1 and 2
    assert(Percentiles.interpolate(4, 0.5, at(1.0, 2.0, 10.0, 11.0)) == 6.0)
    // exact-rank hit: no interpolation term
    assert(Percentiles.interpolate(5, 0.5, at(1.0, 2.0, 3.0, 4.0, 5.0)) == 3.0)
    assert(Percentiles.interpolate(1, 0.75, at(9.0)) == 9.0)
  }
}
