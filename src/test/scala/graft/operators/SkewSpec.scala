package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin preserves join semantics under a hot key") {
    import spark.implicits._
    // 90% of big rows share key 1 (the skew), small is a dim table
    val big = ((1 to 900).map(_ => (1L, "hot")) ++ (1 to 100).map(i => (i.toLong % 7 + 2, "cold")))
      .toDF("k", "side")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    val expected = big.join(small, Seq("k")).count()
    val salted = Skew.saltedJoin(big, small, Seq("k"), nSalts = 8)
    assert(salted.count() === expected)
    // content equality, not just counts
    val diff = big.join(small, Seq("k")).groupBy("k").count().as("a")
      .except(salted.groupBy("k").count())
    assert(diff.count() === 0)
  }

  test("saltedJoin rejects outer types that would replicate the small side") {
    import spark.implicits._
    val big = Seq((1L, "x")).toDF("k", "side")
    val small = Seq((1L, "dim"), (2L, "unmatched")).toDF("k", "name")
    for (jt <- Seq("right", "right_outer", "full", "full_outer")) {
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(big, small, Seq("k"), nSalts = 4, joinType = jt)
      }
    }
    // left outer stays exact: unmatched BIG rows appear once
    val bigL = Seq((1L, "x"), (99L, "nomatch")).toDF("k", "side")
    val left = Skew.saltedJoin(bigL, small, Seq("k"), nSalts = 4, joinType = "left")
    assert(left.count() === 2)
    assert(left.filter(col("name").isNull).count() === 1)
  }

  test("hotKeys surfaces the dominant key") {
    import spark.implicits._
    val big = ((1 to 900).map(_ => 1L) ++ (1 to 100).map(_.toLong + 1)).toDF("k")
    val top = Skew.hotKeys(big, Seq("k"), 1).head()
    assert(top.getLong(0) === 1L)
    assert(top.getLong(1) === 900L)
  }
}
