package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two physical forms of nearest-in-group must return IDENTICAL bits on
  * every input shape, and the router must pick each form in the regime it
  * is linear in (r15 VERDICT #2: nothing routed between the measured-
  * quadratic pairwise form and its O((L+R) log) twin until now).
  */
class NearestInGroupSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  // String.valueOf round-trips doubles bit-exactly (shortest unique repr),
  // so string equality here IS bit equality
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  /** reference shape: bounded group size (~4 right rows/key), group count
    * scales — the regime pairwise is linear in */
  private def boundedGroups: (DataFrame, DataFrame) = {
    import spark.implicits._
    val left = (0 until 200).map(i =>
      (i.toLong, (i % 50).toLong, i * 0.37 - 20.0)).toDF("lid", "k", "lv")
    val right = (0 until 200).map(i =>
      ((i % 50).toLong, i * 0.61 - 35.0)).toDF("k", "rv")
    (left, right)
  }

  /** fixed-group-count shape: 3 keys, both sides large — the regime where
    * pairwise measured cpu exponent 2.2 and sorted-neighbor is the fix */
  private def fixedGroupCount: (DataFrame, DataFrame) = {
    import spark.implicits._
    val left = (0 until 900).map(i =>
      (i.toLong, (i % 3).toLong, math.sin(i * 0.7) * 100)).toDF("lid", "k", "lv")
    val right = (0 until 900).map(i =>
      ((i % 3).toLong, math.cos(i * 1.3) * 100)).toDF("k", "rv")
    (left, right)
  }

  test("both forms return identical bits on both fixture shapes") {
    for ((l, r) <- Seq(boundedGroups, fixedGroupCount)) {
      val p = NearestInGroup.pairwise(l, r.filter(col("rv").isNotNull),
        Seq("k"), Seq("k"), "lv", "rv")
      val s = NearestInGroup.sortedNeighbor(l, r.filter(col("rv").isNotNull),
        Seq("k"), Seq("k"), "lv", "rv")
      assert(canon(p) == canon(s))
      assert(p.columns.toSeq == l.columns.toSeq ++ Seq("n_group", "min_gap"))
    }
  }

  test("router picks pairwise when the MG bound proves bounded fan-out") {
    val (l, r) = boundedGroups
    val res = NearestInGroup.nearest(l, r, Seq("k"), Seq("k"), "lv", "rv")
    assert(res.decision.strategy == "pairwise", res.decision.reason)
    assert(res.decision.reason.contains("MG upper bound"))
    assert(canon(res.df) == canon(
      NearestInGroup.sortedNeighbor(l, r, Seq("k"), Seq("k"), "lv", "rv")))
  }

  test("router declines pairwise above the fan-out bound") {
    val (l, r) = fixedGroupCount
    // 300 rows/key on the right; prove the route flips under a bound below it
    val res = NearestInGroup.nearest(l, r, Seq("k"), Seq("k"), "lv", "rv",
      maxPairwiseGroupRows = 64)
    assert(res.decision.strategy == "sorted-neighbor", res.decision.reason)
    assert(res.decision.maxKeyRowsRight > 64)
    assert(canon(res.df) == canon(
      NearestInGroup.pairwise(l, r, Seq("k"), Seq("k"), "lv", "rv")))
  }

  test("nulls: null keys never match, null values excluded from count and gap") {
    import spark.implicits._
    val l = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, 5.0), (2L, 10L, null), (3L, null, 1.0), (4L, 99L, 1.0)
    ).toDF("lid", "k", "lv")
    val r = Seq[(java.lang.Long, java.lang.Double)](
      (10L, 4.0), (10L, 7.5), (10L, null), (77L, 0.0)
    ).toDF("k", "rv")
    for (df <- Seq(
        NearestInGroup.pairwise(l, r.filter(col("rv").isNotNull),
          Seq("k"), Seq("k"), "lv", "rv"),
        NearestInGroup.sortedNeighbor(l, r.filter(col("rv").isNotNull),
          Seq("k"), Seq("k"), "lv", "rv"))) {
      val rows = df.orderBy("lid").collect()
      // only lid 1 and 2 survive (key 10); null key and unmatched key drop
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(rows.forall(_.getAs[Long]("n_group") == 2L)) // null rv excluded
      assert(rows(0).getAs[Double]("min_gap") == 1.0) // |5.0 - 4.0|
      assert(rows(1).isNullAt(rows(1).fieldIndex("min_gap"))) // null lv
    }
  }

  test("duplicate left rows each keep their own output row") {
    import spark.implicits._
    val l = Seq((10L, 5.0), (10L, 5.0)).toDF("k", "lv") // no unique key
    val r = Seq((10L, 4.0)).toDF("k", "rv")
    for (df <- Seq(
        NearestInGroup.pairwise(l, r, Seq("k"), Seq("k"), "lv", "rv"),
        NearestInGroup.sortedNeighbor(l, r, Seq("k"), Seq("k"), "lv", "rv"))) {
      assert(df.count() == 2)
      assert(df.collect().forall(_.getAs[Double]("min_gap") == 1.0))
    }
  }
}
