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

  test("interpolate reproduces percentile_cont arithmetic") {
    def at(s: Double*): Long => Double = i => s(i.toInt)
    // n=4, q=0.5 -> pos=1.5 -> midpoint of ranks 1 and 2
    assert(Percentiles.interpolate(4, 0.5, at(1.0, 2.0, 10.0, 11.0)) == 6.0)
    // exact-rank hit: no interpolation term
    assert(Percentiles.interpolate(5, 0.5, at(1.0, 2.0, 3.0, 4.0, 5.0)) == 3.0)
    assert(Percentiles.interpolate(1, 0.75, at(9.0)) == 9.0)
  }
}
