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

  test("hotKeys surfaces the dominant key") {
    import spark.implicits._
    val big = ((1 to 900).map(_ => 1L) ++ (1 to 100).map(_.toLong + 1)).toDF("k")
    val top = Skew.hotKeys(big, Seq("k"), 1).head()
    assert(top.getLong(0) === 1L)
    assert(top.getLong(1) === 900L)
  }
}
