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

  // ----- 2-D (the reference's actual J7 shape: Euclidean nearest defender)

  /** bounded 2-D groups (~4 right rows/key, many keys) */
  private def bounded2d: (DataFrame, DataFrame) = {
    import spark.implicits._
    val left = (0 until 200).map(i => (i.toLong, (i % 50).toLong,
      i * 0.37 - 20.0, math.sin(i * 0.9) * 30)).toDF("lid", "k", "lx", "ly")
    val right = (0 until 200).map(i => ((i % 50).toLong,
      i * 0.61 - 35.0, math.cos(i * 1.1) * 30)).toDF("k", "rx", "ry")
    (left, right)
  }

  /** fixed group count, both sides large — the regime the grid form is for */
  private def fixedCount2d: (DataFrame, DataFrame) = {
    import spark.implicits._
    val left = (0 until 900).map(i => (i.toLong, (i % 3).toLong,
      math.sin(i * 0.7) * 100, math.cos(i * 0.31) * 100)).toDF("lid", "k", "lx", "ly")
    val right = (0 until 900).map(i => ((i % 3).toLong,
      math.cos(i * 1.3) * 100, math.sin(i * 0.17) * 100)).toDF("k", "rx", "ry")
    (left, right)
  }

  test("2-D: grid ≡ pairwise bit-equality on both shapes, across eps regimes") {
    // eps spans: smaller than typical NN distance (mostly fallback), around
    // it (the intended operating point), and one giant cell (grid join
    // degenerates to pairwise-with-extra-steps) — exactness must not depend
    // on the tuning knob
    for ((l, r) <- Seq(bounded2d, fixedCount2d); eps <- Seq(0.5, 8.0, 1000.0)) {
      val p = NearestInGroup.pairwise2d(l, r, Seq("k"), Seq("k"),
        "lx", "ly", "rx", "ry")
      val g = NearestInGroup.grid2d(l, r, Seq("k"), Seq("k"),
        "lx", "ly", "rx", "ry", eps)
      assert(canon(p) == canon(g), s"eps=$eps")
      assert(g.columns.toSeq == l.columns.toSeq ++ Seq("n_group", "min_dist"))
    }
  }

  test("2-D grid: far-from-origin coordinates with a pinned eps stay exact") {
    // r17 ADVICE: the floor(x/eps) cell-index rounding error scales with
    // |x/eps|, not eps — at coordinates ~1e12 and a tiny pinned eps the old
    // relative-only slack could admit a non-minimal min_dist. The absolute
    // 4·(maxAbs+eps)·ulp(1) slack must keep grid ≡ pairwise in every
    // regime, including the one where the slack consumes eps entirely and
    // every row takes the exact fallback.
    import spark.implicits._
    val off = 1.0e12
    val left = (0 until 600).map(i => (i.toLong, (i % 2).toLong,
      off + math.sin(i * 0.7) * 3, off + math.cos(i * 0.31) * 3))
      .toDF("lid", "k", "lx", "ly")
    val right = (0 until 600).map(i => ((i % 2).toLong,
      off + math.cos(i * 1.3) * 3, off + math.sin(i * 0.17) * 3))
      .toDF("k", "rx", "ry")
    val p = NearestInGroup.pairwise2d(left, right, Seq("k"), Seq("k"),
      "lx", "ly", "rx", "ry")
    // 5e-4: slack > threshold, 100% fallback; 0.01: mixed; 8.0: resolved
    for (eps <- Seq(5e-4, 0.01, 8.0)) {
      val g = NearestInGroup.grid2d(left, right, Seq("k"), Seq("k"),
        "lx", "ly", "rx", "ry", eps)
      assert(canon(p) == canon(g), s"eps=$eps at offset $off")
    }
  }

  test("2-D router: pairwise under the MG bound, grid above it") {
    val (lb, rb) = bounded2d
    val resB = NearestInGroup.nearest2d(lb, rb, Seq("k"), Seq("k"),
      "lx", "ly", "rx", "ry", eps = 8.0)
    assert(resB.decision.strategy == "pairwise", resB.decision.reason)
    val (lf, rf) = fixedCount2d
    val resF = NearestInGroup.nearest2d(lf, rf, Seq("k"), Seq("k"),
      "lx", "ly", "rx", "ry", eps = 8.0, maxPairwiseGroupRows = 64)
    assert(resF.decision.strategy == "grid", resF.decision.reason)
    assert(resF.decision.maxKeyRowsRight > 64)
    assert(canon(resF.df) == canon(NearestInGroup.pairwise2d(lf, rf,
      Seq("k"), Seq("k"), "lx", "ly", "rx", "ry")))
    // density-derived eps (the default): same bits, cost-only choice
    val resAuto = NearestInGroup.nearest2d(lf, rf, Seq("k"), Seq("k"),
      "lx", "ly", "rx", "ry", maxPairwiseGroupRows = 64)
    assert(resAuto.decision.strategy == "grid")
    assert(canon(resAuto.df) == canon(resF.df))
  }

  test("2-D nulls: null keys never match; null coords excluded right, null min_dist left") {
    import spark.implicits._
    val l = Seq[(java.lang.Long, java.lang.Long, java.lang.Double, java.lang.Double)](
      (1L, 10L, 0.0, 0.0), (2L, 10L, null, 1.0), (3L, null, 1.0, 1.0),
      (4L, 99L, 1.0, 1.0)
    ).toDF("lid", "k", "lx", "ly")
    val r = Seq[(java.lang.Long, java.lang.Double, java.lang.Double)](
      (10L, 3.0, 4.0), (10L, 6.0, 8.0), (10L, null, 1.0), (77L, 0.0, 0.0)
    ).toDF("k", "rx", "ry")
    val rNn = r.filter(col("rx").isNotNull && col("ry").isNotNull)
    for (df <- Seq(
        NearestInGroup.pairwise2d(l, rNn, Seq("k"), Seq("k"), "lx", "ly", "rx", "ry"),
        NearestInGroup.grid2d(l, rNn, Seq("k"), Seq("k"), "lx", "ly", "rx", "ry", 2.0))) {
      val rows = df.orderBy("lid").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(rows.forall(_.getAs[Long]("n_group") == 2L)) // null-coord right excluded
      assert(rows(0).getAs[Double]("min_dist") == 5.0) // 3-4-5 triangle
      assert(rows(1).isNullAt(rows(1).fieldIndex("min_dist"))) // null lx
    }
  }

  test("2-D duplicate RIGHT rows: grid dedups positions, counts multiplicities") {
    import spark.implicits._
    // 100 exact copies per right position — the replicated-tier shape that
    // degenerates a per-row candidate join; the contract must not notice
    val l = (0 until 50).map(i => (i.toLong, 10L,
      i * 1.3, math.sin(i.toDouble) * 10)).toDF("lid", "k", "lx", "ly")
    val rBase = (0 until 8).map(j => (10L, j * 7.0 + 0.5, j * 3.0 - 4.0))
    val r = (0 until 100).flatMap(_ => rBase).toDF("k", "rx", "ry")
    val p = NearestInGroup.pairwise2d(l, r, Seq("k"), Seq("k"),
      "lx", "ly", "rx", "ry")
    for (eps <- Seq(2.0, 50.0)) {
      val g = NearestInGroup.grid2d(l, r, Seq("k"), Seq("k"),
        "lx", "ly", "rx", "ry", eps)
      assert(canon(g) == canon(p), s"eps=$eps")
    }
    assert(p.collect().forall(_.getAs[Long]("n_group") == 800L),
      "n_group counts ROWS (multiplicities), not distinct positions")
  }

  test("2-D duplicate left rows each keep their own output row") {
    import spark.implicits._
    val l = Seq((10L, 1.0, 1.0), (10L, 1.0, 1.0)).toDF("k", "lx", "ly")
    val r = Seq((10L, 4.0, 5.0)).toDF("k", "rx", "ry")
    for (df <- Seq(
        NearestInGroup.pairwise2d(l, r, Seq("k"), Seq("k"), "lx", "ly", "rx", "ry"),
        NearestInGroup.grid2d(l, r, Seq("k"), Seq("k"), "lx", "ly", "rx", "ry", 2.0))) {
      assert(df.count() == 2)
      assert(df.collect().forall(_.getAs[Double]("min_dist") == 5.0))
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
