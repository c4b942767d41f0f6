package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def quotes: DataFrame =
    Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "qt", "v")

  private def trades: DataFrame =
    Seq((1L, 9L, 100L), (1L, 10L, 101L), (1L, 25L, 102L),
        (2L, 4L, 103L), (3L, 50L, 104L))
      .toDF("k", "tt", "trade_id")

  private def run(tol: Option[Long] = None): Map[Long, (Option[String], Option[Long])] =
    AsofJoin.backward(trades, quotes, Seq("k"), "tt", "qt", Seq("v"),
        matchedTimeCol = "mt", tolerance = tol)
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[String]("v")),
         if (r.isNullAt(r.fieldIndex("mt"))) None else Some(r.getAs[Long]("mt"))))
      .toMap

  test("backward match, inclusive ties, null when nothing precedes") {
    val m = run()
    assert(m(100L) === ((None, None)))             // 9 < first quote at 10
    assert(m(101L) === ((Some("a"), Some(10L))))   // equal timestamps match
    assert(m(102L) === ((Some("b"), Some(20L))))   // latest at-or-before wins
    assert(m(103L) === ((None, None)))             // 4 < 5
    assert(m(104L) === ((None, None)))             // key 3 has no quotes at all
  }

  test("tolerance nulls out stale matches but keeps the left row") {
    val m = run(tol = Some(3L))
    assert(m.size === 5, "left join: every trade survives")
    assert(m(101L) === ((Some("a"), Some(10L))))   // gap 0 <= 3
    assert(m(102L) === ((None, None)))             // gap 5 > 3 -> nulled
  }

  test("a matching right row with NULL payload yields NULL, not an older value") {
    // regression: per-column last(ignoreNulls) would splice v='a' from t=10
    // into the match at t=20; the struct-valued form must not
    val q = Seq((1L, 10L, Some("a")), (1L, 20L, None))
      .toDF("k", "qt", "v")
    val t = Seq((1L, 25L, 1L)).toDF("k", "tt", "trade_id")
    val r = AsofJoin.backward(t, q, Seq("k"), "tt", "qt", Seq("v"),
      matchedTimeCol = "mt").head()
    assert(r.isNullAt(r.fieldIndex("v")), "payload must be the matched row's NULL")
    assert(r.getAs[Long]("mt") === 20L, "matched time must still be the latest row")
  }

  test("timestamp time columns keep sub-second ordering (µs, not seconds)") {
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val q = Seq((1L, ts(10_700), "late")) // 10.7 s — AFTER the trade
      .toDF("k", "qt", "v")
    val t = Seq((1L, ts(10_200), 1L)).toDF("k", "tt", "trade_id")
    val r = AsofJoin.backward(t, q, Seq("k"), "tt", "qt", Seq("v")).head()
    // a seconds-truncating cast would see both at t=10 and match the future quote
    assert(r.isNullAt(r.fieldIndex("v")),
      "a sub-second-future quote must not match at-or-before")
  }

  test("fractional time columns keep sub-integer ordering") {
    // regression: a cast("long") would see 1.2 and 1.9 both as 1 and attach
    // the FUTURE quote via the side tie-break
    val q = Seq((1L, 1.9, "future")).toDF("k", "qt", "v")
    val t = Seq((1L, 1.2, 1L)).toDF("k", "tt", "trade_id")
    val r = AsofJoin.backward(t, q, Seq("k"), "tt", "qt", Seq("v")).head()
    assert(r.isNullAt(r.fieldIndex("v")),
      "a fractionally-future quote must not match at-or-before")
  }

  test("date-typed time columns join on epoch days") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val q = Seq((1L, d("2024-01-10"), "jan"), (1L, d("2024-02-10"), "feb"))
      .toDF("k", "qt", "v")
    val t = Seq((1L, d("2024-01-15"), 1L), (1L, d("2024-02-10"), 2L),
        (1L, d("2024-01-01"), 3L))
      .toDF("k", "tt", "trade_id")
    val got = AsofJoin.backward(t, q, Seq("k"), "tt", "qt", Seq("v"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[String]("v"))).toMap
    assert(got === Map(1L -> Some("jan"), 2L -> Some("feb"), 3L -> None))
  }

  test("matches a brute-force oracle on random data") {
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(300)(i => (rnd.nextInt(8).toLong, rnd.nextInt(100).toLong, i.toLong))
    val rRaw = Seq.tabulate(200)(i => (rnd.nextInt(8).toLong, rnd.nextInt(100).toLong, i.toLong))
    // unique right rows per (k, t): keep max payload, as the contract requires
    val r = rRaw.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq

    val got = AsofJoin.backward(
        l.toDF("k", "lt", "lid"), r.toDF("k", "rt", "pay"),
        Seq("k"), "lt", "rt", Seq("pay"))
      .collect()
      .map(row => row.getAs[Long]("lid") ->
        (if (row.isNullAt(row.fieldIndex("pay"))) None
         else Some(row.getAs[Long]("pay"))))
      .toMap

    val expected = l.map { case (k, t, lid) =>
      val cands = r.filter(x => x._1 == k && x._2 <= t)
      lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got === expected)
  }

  test("backwardSalted matches the brute-force oracle across random seeds, " +
    "tolerances, and split counts") {
    // property-style sweep: the salted variant must equal the brute oracle
    // (not just `backward`) on freshly drawn data per configuration —
    // varied key skew, time ranges, tolerance, and bucket counts
    for (seed <- Seq(11, 23, 47); nSplits <- Seq(2, 5); tol <- Seq(None, Some(20L))) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(6)
      val span = 50 + rnd.nextInt(200)
      val l = Seq.tabulate(250)(i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(span).toLong, i.toLong))
      val r = Seq.tabulate(150)(i =>
          (rnd.nextInt(nKeys).toLong, rnd.nextInt(span).toLong, i.toLong))
        .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
      val got = AsofJoin.backwardSalted(
          l.toDF("k", "lt", "lid"), r.toDF("k", "rt", "pay"),
          Seq("k"), "lt", "rt", Seq("pay"), matchedTimeCol = "mt",
          tolerance = tol, nSplits = nSplits)
        .collect()
        .map(row => row.getAs[Long]("lid") ->
          (if (row.isNullAt(row.fieldIndex("pay"))) None
           else Some(row.getAs[Long]("pay"))))
        .toMap
      val expected = l.map { case (k, t, lid) =>
        val cands = r.filter(x => x._1 == k && x._2 <= t &&
          tol.forall(w => t - x._2 <= w))
        lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
      }.toMap
      assert(got === expected, s"seed=$seed nSplits=$nSplits tol=$tol")
    }
  }

  test("composite keys partition matches independently") {
    val q = Seq((1L, "x", 10L, "k1x"), (1L, "y", 10L, "k1y"), (2L, "x", 10L, "k2x"))
      .toDF("k1", "k2", "qt", "v")
    val t = Seq((1L, "x", 15L, 1L), (1L, "y", 15L, 2L),
        (2L, "x", 15L, 3L), (2L, "y", 15L, 4L))
      .toDF("k1", "k2", "tt", "trade_id")
    val got = AsofJoin.backward(t, q, Seq("k1", "k2"), "tt", "qt", Seq("v"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[String]("v"))).toMap
    assert(got === Map(1L -> Some("k1x"), 2L -> Some("k1y"),
      3L -> Some("k2x"), 4L -> None))
  }

  test("NULL time rows never match: no phantom quotes, left nulls kept") {
    // regression (round-5 ADVICE): a NULL-time quote sorts NULLS FIRST with a
    // non-null Q struct, so last(ignoreNulls) carried it into left rows that
    // have no real preceding quote — DuckDB ASOF / merge_asof never match
    // NULL times
    val q = Seq((1L, None, "phantom"), (1L, Some(10L), "real"))
      .toDF("k", "qt", "v")
    val t = Seq((1L, Some(5L), 1L), (1L, Some(15L), 2L), (1L, None, 3L))
      .toDF("k", "tt", "trade_id")
    val got = AsofJoin.backward(t, q, Seq("k"), "tt", "qt", Seq("v"),
        matchedTimeCol = "mt")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[String]("v"))).toMap
    assert(got === Map(
      1L -> None,          // 5 < 10 and the NULL-time quote must not fill in
      2L -> Some("real"),  // normal match unaffected
      3L -> None))         // NULL-time left row: kept (left join), no match
  }

  test("reserved __asof_* names and duplicate payloads are rejected up front") {
    val bad = trades.withColumn("__asof_t", lit(1))
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.backward(bad, quotes, Seq("k"), "tt", "qt", Seq("v"))
    }
    assert(e1.getMessage.contains("__asof_t"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, quotes, Seq("k"), "tt", "qt", Seq("v", "v"))
    }
    assert(e2.getMessage.contains("v"))
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, quotes, Seq("k"), "tt", "qt", Seq("v"),
        matchedTimeCol = "__asof_q")
    }
    assert(e3.getMessage.contains("__asof_q"))
    // the salted variant's internal span/bucket columns are reserved too —
    // an input carrying one would otherwise hit an ambiguous-attribute
    // AnalysisException mid-plan after the broadcast span cross join
    val e4 = intercept[IllegalArgumentException] {
      AsofJoin.backwardSalted(trades.withColumn("__asof_mn", lit(0)),
        quotes, Seq("k"), "tt", "qt", Seq("v"))
    }
    assert(e4.getMessage.contains("__asof_mn"))
  }

  private def asMap(df: DataFrame): Map[Long, (Option[Long], Option[Long])] =
    df.collect().map(row => row.getAs[Long]("lid") -> ((
      if (row.isNullAt(row.fieldIndex("pay"))) None else Some(row.getAs[Long]("pay")),
      if (row.isNullAt(row.fieldIndex("mt"))) None else Some(row.getAs[Long]("mt")))))
      .toMap

  test("backwardSalted: exact parity with backward on a deliberately hot key") {
    val rnd = new scala.util.Random(13)
    // key 0 owns ~85% of both sides and spans the whole time range — the
    // shape whose single-task sort the salted variant exists to split
    def hotKey(): Long = if (rnd.nextInt(100) < 85) 0L else 1L + rnd.nextInt(4)
    val l = Seq.tabulate(600)(i => (hotKey(), rnd.nextInt(10_000).toLong, i.toLong))
    val rRaw = Seq.tabulate(400)(i => (hotKey(), rnd.nextInt(10_000).toLong, i.toLong))
    val r = rRaw.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
    val lDf = l.toDF("k", "lt", "lid")
    val rDf = r.toDF("k", "rt", "pay")

    for (tol <- Seq(None, Some(500L)); nSplits <- Seq(1, 3, 8)) {
      val plain = asMap(AsofJoin.backward(lDf, rDf, Seq("k"), "lt", "rt",
        Seq("pay"), matchedTimeCol = "mt", tolerance = tol))
      val salted = asMap(AsofJoin.backwardSalted(lDf, rDf, Seq("k"), "lt", "rt",
        Seq("pay"), matchedTimeCol = "mt", tolerance = tol, nSplits = nSplits))
      assert(salted === plain, s"tol=$tol nSplits=$nSplits")
    }
  }

  test("backwardSalted: reigning quote crosses empty buckets; NULL times safe") {
    // one early quote, probes much later: with 8 splits the probes' buckets
    // have no native quote and must see the carried one, at its ORIGINAL
    // time (so tolerance still measures the true gap)
    val q = Seq((1L, Some(10L), 7L), (1L, None, 666L)).toDF("k", "qt", "pay")
    val t = Seq((1L, Some(9_000L), 1L), (1L, Some(9_500L), 2L),
        (1L, None, 3L))
      .toDF("k", "lt", "lid")
    val got = asMap(AsofJoin.backwardSalted(t, q, Seq("k"), "lt", "qt",
      Seq("pay"), matchedTimeCol = "mt", nSplits = 8))
    assert(got === Map(
      1L -> ((Some(7L), Some(10L))),
      2L -> ((Some(7L), Some(10L))),
      3L -> ((None, None)))) // NULL-time probe: kept, unmatched
    // tolerance measured from the ORIGINAL quote time nulls the stale carry
    val gotTol = asMap(AsofJoin.backwardSalted(t, q, Seq("k"), "lt", "qt",
      Seq("pay"), matchedTimeCol = "mt", tolerance = Some(100L), nSplits = 8))
    assert(gotTol(1L) === ((None, None)) && gotTol(2L) === ((None, None)))
  }

  test("backwardSalted plan: the main exchange keys on (key, bucket)") {
    val rnd = new scala.util.Random(5)
    val l = Seq.tabulate(400)(i => (0L, rnd.nextInt(10_000).toLong, i.toLong))
    val df = AsofJoin.backwardSalted(l.toDF("k", "lt", "lid"),
      quotes.withColumnRenamed("k", "kk").withColumn("k", lit(0L)).drop("kk"),
      Seq("k"), "lt", "qt", Seq("v"), nSplits = 8)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val parts = plan.collectWithSubqueries {
      case s: ShuffleExchangeLike => s.outputPartitioning.toString
    }
    assert(parts.exists(p => p.contains("__asof_b")),
      s"hot key must spread over (key, bucket) partitions, got: $parts")
  }

  test("plan: one key exchange, no join blow-up") {
    val df = AsofJoin.backward(trades, quotes, Seq("k"), "tt", "qt", Seq("v"))
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collectWithSubqueries { case s: ShuffleExchangeLike => s }
    assert(shuffles.size === 1,
      s"as-of join must cost exactly one exchange, got ${shuffles.size}")
    val joins = plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(joins.isEmpty, "no theta/cartesian join may appear in the as-of plan")
  }
}
