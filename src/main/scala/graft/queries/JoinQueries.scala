package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators (SURVEY §2.3).
  *
  * Scale design: dimension sides (customer/supplier/nation) are `broadcast()`-hinted —
  * at 100 TB the fact side never shuffles for those joins. Fact-fact joins (self-join,
  * pair joins) shuffle on their equi-keys and rely on AQE for skew splitting. The
  * grouped cross joins (J6/J7) are many-to-many *equi* joins on the group key — the
  * cartesian blowup is bounded per group (reference: ≤1×11 defender pairs per play,
  * preprocess.py:391-395), so the shuffle is proportional to output size.
  */
object JoinQueries {

  /** Write-once bucketed twins of lineitem/orders for [[j_star_chain]]'s
    * co-located variant: both sides bucketed AND sorted on the order key, so
    * the fact-fact join plans with ZERO exchange and ZERO sort on either
    * side (LakeSpec proves the general property; this makes it a benched,
    * oracle-checked query). Idempotent per (session, sf dir) — the one-time
    * write is the amortized cost bucketing always has; every downstream
    * join/agg on the key then skips the network entirely, which at 100 TB is
    * the difference between moving the fact table per query and never
    * moving it.
    */
  private[graft] def bucketedFacts(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // the sanitized path IS the tag — a hash could silently collide across
    // data dirs and serve the wrong dir's rows from the warehouse
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tables = Seq(
      (s"li_bk_$tag", () => Tables.lineitem(s, dir), "l_orderkey"),
      (s"or_bk_$tag", () => Tables.orders(s, dir), "o_orderkey"))
    tables.foreach { case (t, df, key) =>
      if (!s.catalog.tableExists(t)) {
        // sweep a stale warehouse dir from a previous process (the in-memory
        // catalog forgets tables across sessions; the files survive)
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + s"/$t")
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        graft.sources.Lake.writeBucketed(df(), t, Seq(key), 32,
          sortCols = Seq(key))
      }
    }
    (s.table(tables.head._1), s.table(tables(1)._1))
  }

  /** The star-chain aggregation shared by [[j_star_chain]] (plain scans,
    * routed SHUFFLE_HASH fact join) and [[j_star_chain_bucketed]]
    * (co-bucketed facts, exchange- and sort-free join): dims broadcast,
    * decimal-exact revenue. Takes the already-joined facts — the fact⋈fact
    * edge is each variant's whole point. The oracle is identical —
    * bucketing/routing is a physical property. */
  private def starChain(s: org.apache.spark.sql.SparkSession, dir: String,
      facts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    facts
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_items"),
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("r_name", "n_name")

  private val starChainSql =
    s"""SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_items,
       |  ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Non-equi RANGE join: facts against a tiny band dimension via BETWEEN —
    // broadcast nested-loop on a 4-row side, the correct physical shape
    // (never shuffle a fact for a banding dim; at huge band counts switch to
    // a range-bucketed equi-key). Bands derived in-query so both engines see
    // identical data.
    QueryDef(
      "j_range_band",
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val bands = Seq(
          ("low", 0.0, 20000.0), ("mid", 20000.0, 45000.0),
          ("high", 45000.0, 80000.0), ("extreme", 80000.0, 1e9))
          .toDF("band", "lo", "hi")
        Tables.lineitem(s, dir)
          .join(broadcast(bands),
            col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"),
            Exact.dsum(col("l_extendedprice")).as("band_revenue"))
          .orderBy("band")
      },
      Some(s"""WITH bands(band, lo, hi) AS (VALUES
              |  ('low', 0.0, 20000.0), ('mid', 20000.0, 45000.0),
              |  ('high', 45000.0, 80000.0), ('extreme', 80000.0, 1e9))
              |SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
              |  ${Exact.sqlDsum("l_extendedprice")} AS band_revenue
              |FROM lineitem JOIN bands
              |  ON l_extendedprice >= lo AND l_extendedprice < hi
              |GROUP BY band ORDER BY band""".stripMargin)),

    // J1 — broadcast left equi-join fact⟕dim (reference: tracking ⟕ supp context,
    // BDB_2026.ipynb cell 17)
    QueryDef(
      "j1_broadcast_left",
      (s, dir) =>
        Tables.orders(s, dir)
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"), "left")
          .select("o_orderkey", "c_name", "c_mktsegment")
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, c_name, c_mktsegment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // J2/J3 — inner equi-join on a composite key (reference: 3/4-col key joins,
    // preprocess.py:545). Dim is derived by dedup-before-join (reference:
    // preprocess.py:318-321).
    QueryDef(
      "j2_multikey_inner",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val pairCounts = li.groupBy("l_partkey", "l_suppkey")
          .agg(count(lit(1)).as("pair_cnt"))
        li.join(pairCounts, Seq("l_partkey", "l_suppkey"), "inner")
          .select("l_orderkey", "l_linenumber", "pair_cnt")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH pc AS (
             |  SELECT l_partkey, l_suppkey, CAST(COUNT(*) AS BIGINT) AS pair_cnt
             |  FROM lineitem GROUP BY l_partkey, l_suppkey)
             |SELECT l.l_orderkey, l.l_linenumber, pc.pair_cnt
             |FROM lineitem l JOIN pc USING (l_partkey, l_suppkey)
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)),

    // J4 — left-semi join (reference: keep only completed passes,
    // preprocess.py:302-327). Semi avoids the dedup step entirely.
    QueryDef(
      "j4_semi",
      (s, dir) => {
        val finished = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        Tables.lineitem(s, dir)
          .join(finished, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Left-anti join (complement of J4; the reference's closest analogue is the
    // NOT-IN filter P4) — parts never shipped in bulk (quantity > 45).
    QueryDef(
      "j_anti",
      (s, dir) =>
        Tables.part(s, dir)
          .join(Tables.lineitem(s, dir).filter(col("l_quantity") > 45),
            col("p_partkey") === col("l_partkey"), "left_anti")
          .select("p_partkey", "p_name")
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_partkey = p_partkey AND l_quantity > 45)
             |ORDER BY p_partkey""".stripMargin)),

    // J5 — rows at per-group argmax, window form (reference: throw-frame rows via
    // per-play max(frame_id), preprocess.py:367-373 — window beats join+filter:
    // no second shuffle). Ties are kept, matching the reference's join-equality form.
    QueryDef(
      "j5_argmax_rows",
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey")
        Tables.lineitem(s, dir)
          .withColumn("max_qty", max("l_quantity").over(w))
          .filter(col("l_quantity") === col("max_qty"))
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |QUALIFY l_quantity = MAX(l_quantity) OVER (PARTITION BY l_orderkey)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // J6 — grouped cross join: all pairs within a group (reference: target × defenders
    // in the same play, preprocess.py:391-395). Equi-join on the group key bounds the
    // blowup to group-size².
    QueryDef(
      "j6_pairs_in_group",
      (s, dir) => {
        val sup = Tables.supplier(s, dir)
        val a = sup.select(col("s_nationkey").as("nk"), col("s_suppkey").as("k1"),
          col("s_acctbal").as("b1"))
        val b = sup.select(col("s_nationkey").as("nk"), col("s_suppkey").as("k2"),
          col("s_acctbal").as("b2"))
        a.join(b, Seq("nk")).filter(col("k1") < col("k2"))
          .select(col("nk"), col("k1"), col("k2"), abs(col("b1") - col("b2")).as("bal_gap"))
          .orderBy("nk", "k1", "k2")
      },
      Some("""SELECT a.s_nationkey AS nk, a.s_suppkey AS k1, b.s_suppkey AS k2,
             |       abs(a.s_acctbal - b.s_acctbal) AS bal_gap
             |FROM supplier a JOIN supplier b
             |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
             |ORDER BY nk, k1, k2""".stripMargin),
      scaleNote = Some("OUTPUT_BOUND: grouped cross join — the OUTPUT is the " +
        "pairs, Σ per-group |L_i|·|R_i| by the operator's contract, " +
        "quadratic under replication; the exponent measures output growth, " +
        "not a scaling bug")),

    // J7 — nearest-neighbor within group via join+min (reference: per-frame nearest
    // defender, BDB_2026.ipynb cell 69 — the O(n²) Python loop becomes one shuffle
    // join + partial agg; the single biggest scalability win in the survey).
    QueryDef(
      "j7_nearest_in_group",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey").as("nk"), col("c_acctbal"))
        val sup = Tables.supplier(s, dir)
          .select(col("s_nationkey").as("nk"), col("s_acctbal"))
        // The engine's own hot join runs THROUGH the router (r12 VERDICT
        // #7): the one-pass-per-side preflight prices the join, picks
        // broadcast here (supplier is dimension-sized at every bench SF —
        // RoutedPickSpec asserts the decision, the fingerprint pins the
        // physical shape), and would flip to salt/bloom/shuffle unchanged
        // in code the day the inputs outgrow the hint a human would have
        // hardcoded.
        graft.operators.Joins
          .routed(cust, sup, Seq("nk"), Seq("nk")).df
          .groupBy("c_custkey")
          .agg(
            count(lit(1)).as("n_sup"),
            min(abs(col("c_acctbal") - col("s_acctbal"))).as("min_gap"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_sup,
             |       min(abs(c_acctbal - s_acctbal)) AS min_gap
             |FROM customer JOIN supplier ON c_nationkey = s_nationkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),
      scaleNote = Some("OUTPUT_BOUND: deliberately PINS the pairwise " +
        "physical form as the oracle anchor for the bounded-group regime - " +
        "quadratic when the group count is fixed and both sides scale BY " +
        "DESIGN of the fixture; the scale path is j7_nearest_routed (gated " +
        "linear) and j7_nearest_2d (grid); this row exists so the pairwise " +
        "form's oracle never drifts")),

    // J7 SCALE TWIN — the r15 sweep measured the pairwise form at cpu
    // exponent 2.2 over 10x->100x data: with the GROUP COUNT fixed (25
    // nations) and BOTH sides scaling, enumerate-then-min is inherently
    // quadratic. That regime is fine for the reference's shape (nearest
    // defender: ~11 defenders per frame — group size BOUNDED, groups scale
    // -> linear), but a 100 TB corpus with fixed group count needs the 1-D
    // reformulation: sort each nation's union of customers and suppliers
    // by acctbal ONCE, and each customer's nearest supplier is one of its
    // two sorted neighbors (min |c-s| is achieved at a neighbor in sorted
    // order), so the whole query is O((C+S) log) with ONE window sort —
    // no pair is ever enumerated. Same rows as j7 (the oracle is j7's);
    // bit-exact because v-below / above-v are the same double
    // subtractions the pairwise abs computed. Parallelism is bounded by
    // the group count (one sort partition per nation) — inherent to the
    // data model, documented.
    QueryDef(
      "j7_nearest_asof",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey").as("nk"), col("c_acctbal"))
        val sup = Tables.supplier(s, dir)
          .select(col("s_nationkey").as("nk"), col("s_acctbal"))
        val supN = sup.groupBy("nk").agg(count(lit(1)).as("n_sup"))
        val tagged = cust
          .select(col("nk"), col("c_acctbal").as("v"), col("c_custkey"),
            lit(0).as("is_sup"))
          .unionByName(sup.select(col("nk"), col("s_acctbal").as("v"),
            lit(null).cast("long").as("c_custkey"), lit(1).as("is_sup")))
        // BOTH frames must be GROWING (unboundedPreceding..currentRow):
        // Spark evaluates a growing frame incrementally (O(1)/row) but
        // recomputes a shrinking `1..unboundedFollowing` frame from
        // scratch per row — O(rows²) per partition, measured at 2165
        // cpu_s at sf10 (WORSE than the pairwise join it replaces). The
        // forward neighbor is therefore a growing frame over the
        // REVERSED order: one exchange, two in-partition sorts, O(n log n).
        // Suppliers sort BEFORE customers at equal v in both orders, so a
        // zero-gap supplier is caught either way.
        val sv = when(col("is_sup") === 1, col("v"))
        val below = last(sv, ignoreNulls = true).over(
          Window.partitionBy("nk")
            .orderBy(col("v"), col("is_sup").desc, col("c_custkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        val above = last(sv, ignoreNulls = true).over(
          Window.partitionBy("nk")
            .orderBy(col("v").desc, col("is_sup").desc, col("c_custkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        tagged
          .select(col("nk"), col("v"), col("c_custkey"), col("is_sup"),
            below.as("below"), above.as("above"))
          .filter(col("is_sup") === 0)
          .join(broadcast(supN), Seq("nk"))
          .select(col("c_custkey"), col("n_sup"),
            least(
              when(col("below").isNotNull, col("v") - col("below")),
              when(col("above").isNotNull, col("above") - col("v"))).as("min_gap"))
          // invariant (a supN nation has >= 1 supplier, so one neighbor
          // exists): no-op on rows, but it makes min_gap load-bearing
          // under a count() action so benches time the window instead of
          // a column-pruned shell of it
          .filter(col("min_gap").isNotNull)
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_sup,
             |       min(abs(c_acctbal - s_acctbal)) AS min_gap
             |FROM customer JOIN supplier ON c_nationkey = s_nationkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),
      headline = true),

    // J7 ROUTED — the library entry point that picks between the two forms
    // above on MEASURED stats (r15 VERDICT #2): the preflight's Misra–Gries
    // max-rows-per-key bound proves bounded fan-out → pairwise (the
    // reference's regime, linear, unbounded parallelism), or declines it →
    // sorted-neighbor (fixed group count, O((L+R) log)). Same oracle as j7 —
    // both routes are bit-identical by construction (NearestInGroupSpec) and
    // the decision+reason land in the job log like Joins.routed. Supplier
    // has 25 nations × (SF·400) rows/key, so the route FLIPS with scale:
    // pairwise at sf0.01/sf0.1 (4–40/key, under the 256 fan-out bound),
    // sorted-neighbor from sf1 (400/key) — an adaptive path the sf10
    // correctness tier gates in the regime it actually takes at scale.
    QueryDef(
      "j7_nearest_routed",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey").as("nk"), col("c_acctbal"))
        val sup = Tables.supplier(s, dir)
          .select(col("s_nationkey").as("nk"), col("s_acctbal"))
        graft.operators.NearestInGroup
          .nearest(cust, sup, Seq("nk"), Seq("nk"), "c_acctbal", "s_acctbal")
          .df
          .select(col("c_custkey"), col("n_group").as("n_sup"), col("min_gap"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_sup,
             |       min(abs(c_acctbal - s_acctbal)) AS min_gap
             |FROM customer JOIN supplier ON c_nationkey = s_nationkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // J7 2-D — the reference's ACTUAL nearest-defender shape (Euclidean
    // distance per play, preprocess.py:441-513; bdb/Separation.scala keeps
    // the reference regime's pairwise join, linear only because groups are
    // ~11 defenders). NearestInGroup.nearest2d routes pairwise ↔ grid-cell
    // candidate join on the same MG bound as j7_nearest_routed: pairwise at
    // sf0.01/sf0.1 (4–40 suppliers/key), grid from sf1 (400+/key) — so the
    // scale tiers gate BOTH physical forms of the 2-D operator. Point =
    // (acctbal, key mod 1000): a genuine 2-D layout over the TPC-H-ish
    // tables, same min-over-group oracle shape as j7. Both forms share one
    // IEEE distance expression (bit-equality spec-pinned), and sqrt/mul are
    // correctly rounded in Spark and DuckDB alike, so the oracle compares
    // exact — no rounding crutch.
    QueryDef(
      "j7_nearest_2d",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey").as("nk"),
            col("c_acctbal").as("cx"),
            (col("c_custkey") % 1000).cast("double").as("cy"))
        val sup = Tables.supplier(s, dir)
          .select(col("s_nationkey").as("nk"), col("s_acctbal").as("sx"),
            (col("s_suppkey") % 1000).cast("double").as("sy"))
        // eps omitted → density-derived: a pinned eps=500 measured cpu
        // exponent 1.38 on the 30x->100x tiers (density grows under
        // replication, fixed cells fatten); the derived cell size keeps
        // candidates-per-row constant at any density
        graft.operators.NearestInGroup
          .nearest2d(cust, sup, Seq("nk"), Seq("nk"),
            "cx", "cy", "sx", "sy")
          .df
          .select(col("c_custkey"), col("n_group").as("n_sup"), col("min_dist"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_sup,
             |       min(sqrt((c_acctbal - s_acctbal) * (c_acctbal - s_acctbal)
             |                + (CAST(c_custkey % 1000 AS DOUBLE) - CAST(s_suppkey % 1000 AS DOUBLE))
             |                  * (CAST(c_custkey % 1000 AS DOUBLE) - CAST(s_suppkey % 1000 AS DOUBLE))))
             |         AS min_dist
             |FROM customer JOIN supplier ON c_nationkey = s_nationkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // J8 — left join + fill default (reference: merge defender_sep, missing → 20.0,
    // BDB_2026.ipynb cell 69/75)
    QueryDef(
      "j8_left_join_fill",
      (s, dir) => {
        val returned = Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .groupBy("l_orderkey")
          .agg(Exact.dsum(col("l_quantity")).as("ret_qty_raw"))
        Tables.orders(s, dir)
          .join(returned, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("ret_qty_raw"), lit(0.0)).as("ret_qty"))
          .orderBy("o_orderkey")
      },
      Some(s"""WITH r AS (
              |  SELECT l_orderkey, ${Exact.sqlDsum("l_quantity")} AS ret_qty_raw
              |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey)
              |SELECT o_orderkey, COALESCE(r.ret_qty_raw, 0.0) AS ret_qty
              |FROM orders LEFT JOIN r ON o_orderkey = r.l_orderkey
              |ORDER BY o_orderkey""".stripMargin)),

    // Multi-way star join: lineitem→orders→customer→nation→region with dims
    // broadcast (the full TPC-H-ish chain; reference's J1×3 scorecard merge,
    // metrics.py:198-367).
    QueryDef(
      "j_star_chain",
      (s, dir) => {
        // The fact⋈fact edge runs THROUGH the router (r13 VERDICT #7 — the
        // second real consumer, and the one that exercises the NON-broadcast
        // decision on real data). broadcastMaxRows = 0 is the honest config
        // for a fact-fact join: a side that scales with the data cannot hash
        // into one executor at target scale, and a bench-SF broadcast would
        // demonstrate nothing (the same reasoning that pins the bucketed
        // twin's MERGE). The preflight then measures what stats can't —
        // skew (salt) and overlap (bloom) — and on this uniform FK edge
        // lands on the plain-exchange regime; its decision is logged per
        // build, and JoinsSpec pins the pick. The shuffle regime ELECTS
        // SHUFFLE_HASH on the smaller fact side when its estimated build
        // partition fits the per-slot memory budget (same single exchange
        // per side as sort-merge but skips BOTH sorts — and the hash build
        // can't spill, so under memory pressure the router keeps the
        // spillable sort-merge instead of dying; r14 soak finding): the
        // caller no longer hardcodes the hint.
        val rj = graft.operators.Joins.routed(
          Tables.lineitem(s, dir), Tables.orders(s, dir),
          Seq("l_orderkey"), Seq("o_orderkey"),
          graft.operators.Joins.RouteConfig(broadcastMaxRows = 0))
        starChain(s, dir, rj.df)
      },
      Some(starChainSql),
      headline = true),

    // The same star chain over CO-BUCKETED fact tables: lineitem and orders
    // pre-bucketed + pre-sorted on the order key at write time, so the
    // fact-fact join needs no exchange and no sort — the remaining shuffles
    // are the (tiny) aggregate and final order. The MERGE hint pins that
    // plan: at bench SFs the orders side is under the broadcast threshold
    // and the optimizer would otherwise demonstrate nothing (a BHJ that
    // rebuilds a full-fact hash relation every run — the r12 "no shuffle,
    // 6× cpu" profile); at 100 TB no fact side broadcasts and the
    // co-located sort-free merge IS the plan either way.
    QueryDef(
      "j_star_chain_bucketed",
      (s, dir) => {
        val (li, or) = bucketedFacts(s, dir)
        starChain(s, dir,
          li.join(or.hint("MERGE"), col("l_orderkey") === col("o_orderkey")))
      },
      Some(starChainSql),
      headline = true),

    // Bloom-pruned fact⋈dim-subset join: the probe side (lineitem) is
    // reduced by a bitset over the selected suppliers' keys BEFORE any
    // exchange — at 100 TB the shuffle shrinks by the dim subset's
    // selectivity (~1/25 here) while the result stays EXACTLY the plain
    // inner join (false positives die in the join; no false negatives).
    QueryDef(
      "j_bloom_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val supp = Tables.supplier(s, dir)
          .where(col("s_nationkey") === 7)
          .select("s_suppkey", "s_name")
        // footer-exact row-count upper bound sizes the bloom without the
        // default per-execution distinct-count job (see FileSkipping.tableRows)
        val nSupp = graft.sources.FileSkipping
          .tableRows(s, s"$dir/supplier.parquet", "s_suppkey")
        graft.operators.BloomJoin
          .inner(li, supp, "l_suppkey", "s_suppkey", expectedItems = nSupp)
          .groupBy("s_suppkey", "s_name")
          .agg(count(lit(1)).as("n_items"),
            Exact.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("s_suppkey")
      },
      Some(s"""SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS n_items,
              |  ${Exact.sqlDsum("l_quantity")} AS sum_qty
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |WHERE s_nationkey = 7
              |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin)),

    // Salted skew join (operators/Skew.saltedJoin): the structural fix when
    // one join key dominates so heavily that even AQE's skew-split
    // partitions bottleneck — the fact side scatters each key across 8
    // sub-keys, the dim side replicates 8× to match, and each hot key's
    // rows spread over 8 reducers instead of one. Salting routes rows, it
    // never changes results: the oracle is the PLAIN join, and the hash
    // compare proves salt-and-replicate is semantics-free (the guarantee
    // that matters before pointing it at a genuinely skewed 100 TB key).
    // SkewSpec covers the mechanics (fan-out, outer-join legality).
    QueryDef(
      "j_salted_skew_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_suppkey").as("suppkey"),
            col("l_extendedprice"), col("l_discount"))
        val supp = Tables.supplier(s, dir)
          .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
        graft.operators.Skew.saltedJoin(li, supp, Seq("suppkey"), nSalts = 8)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_items"),
            Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"))
          .orderBy("s_nationkey")
      },
      Some(s"""SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items,
              |  ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // J9 through the contract (operators/Joins.onCommonKeys): the join keys
    // are RESOLVED at plan-build time from whichever candidates both frames
    // carry — here `custkey` matches, the two decoys don't. The oracle is
    // the plain equi-join on that resolved key, gating the resolution
    // itself (a wrong key pick changes every row). Graduates J9 from
    // spec-only (JoinsSpec) to oracle-gated.
    QueryDef(
      "j9_common_keys",
      (s, dir) => {
        val left = Tables.orders(s, dir)
          .select(col("o_custkey").as("custkey"), col("o_totalprice"))
        val right = Tables.customer(s, dir)
          .select(col("c_custkey").as("custkey"),
            col("c_nationkey"), col("c_acctbal"))
        graft.operators.Joins.onCommonKeys(left, broadcast(right),
            Seq("game_id", "custkey", "frame_id"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_orders"),
            Exact.dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("c_nationkey")
      },
      Some(s"""SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
              |  ${Exact.sqlDsum("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Join-size preflight, SELF-AUDITED: the theta-sketch estimate
    // (overlap × mean multiplicities, one agg pass per side) is emitted
    // BESIDE the exact join count, and the query itself gates the
    // accuracy — exact equality while the key domains are below the
    // sketch size (the sf0.01 regime), ≤10 % relative error above it (the
    // sf1 regime; sketch RSE compounds to a few %). Rows-only by design:
    // the estimate is the operator, the exact count is the audit.
    QueryDef(
      "j_size_preflight",
      (s, dir) => {
        import s.implicits._
        val orders = Tables.orders(s, dir)
        val customer = Tables.customer(s, dir)
        val e = graft.operators.Joins.estimateEquiJoinSize(
          orders, customer, "o_custkey", "c_custkey")
        val exact = orders.join(customer,
          orders("o_custkey") === customer("c_custkey")).count()
        val relErr =
          if (exact == 0L) 0.0
          else math.abs(e.estimatedRows - exact) / exact.toDouble
        val belowK = e.distinctLeft <= 4096 && e.distinctRight <= 4096
        // below k the sketch is exact, but overlap × (nk/d) recombines in
        // floating point — gate on a tiny relative tolerance, not ==, so a
        // non-representable multiplicity ratio can't fail a correct estimator
        require(if (belowK) relErr <= 1e-12
                else relErr <= 0.10,
          s"join-size preflight drifted: est ${e.estimatedRows} vs exact " +
            s"$exact (relErr $relErr, belowK=$belowK)")
        Seq((e.rowsLeft, e.rowsRight, e.distinctLeft, e.distinctRight,
          e.keyOverlap, e.estimatedRows, exact, relErr))
          .toDF("rows_left", "rows_right", "distinct_left", "distinct_right",
            "key_overlap", "estimated_rows", "exact_rows", "rel_err")
      },
      None),

    // ROUTED join: the preflight/skew/bloom diagnostics composed into the
    // decision they were built for. The query forces all FOUR regimes on the
    // same fixture (orders ⋈ one nation's customers — naturally broadcast;
    // thresholds force shuffle / salted / bloom), REQUIRES each router pick
    // to be the forced regime, and requires every regime's aggregate to be
    // row-identical before emitting it — so the oracle hash gates all four
    // physical rewrites at once against the plain DuckDB join.
    QueryDef(
      "j_routed",
      (s, dir) => {
        import graft.operators.Joins
        import graft.operators.Joins.RouteConfig
        val orders = Tables.orders(s, dir)
        val cust = Tables.customer(s, dir).filter(col("c_nationkey") === 1)
        def agg(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("c_custkey")
            .agg(count(lit(1)).as("n_orders"),
              Exact.dsum(col("o_totalprice")).as("sum_price"))
            .orderBy("c_custkey")
        val regimes = Seq(
          "broadcast" -> RouteConfig(),
          "shuffle" -> RouteConfig(broadcastMaxRows = 0,
            skewHotFraction = 1.1, bloomMaxMatchFraction = 0.0),
          "salted" -> RouteConfig(broadcastMaxRows = 0,
            skewHotFraction = 0.0),
          "bloom" -> RouteConfig(broadcastMaxRows = 0,
            skewHotFraction = 1.1, bloomMaxMatchFraction = 1.0))
        val results = regimes.map { case (want, cfg) =>
          val rj = Joins.routed(orders, cust,
            Seq("o_custkey"), Seq("c_custkey"), cfg)
          require(rj.decision.strategy == want,
            s"routing drifted: forced $want, router picked " +
              s"${rj.decision.strategy} (${rj.decision.reason})")
          (want, agg(rj.df))
        }
        val base = results.head._2.collect().toSeq
        results.tail.foreach { case (name, df) =>
          require(df.collect().toSeq == base,
            s"routed regime $name result differs from ${results.head._1}")
        }
        results.head._2
      },
      Some(s"""SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
              |  ${Exact.sqlDsum("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |WHERE c_nationkey = 1
              |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // LEFT-OUTER routing: the outer-sound regime subset (right-only
    // broadcast, left-big salting, plain shuffle — the left side's hot-NULL
    // mass is split around the join, never shuffled) forced on one fixture;
    // unmatched orders must survive null-extended into the COALESCE(-1)
    // group identically across regimes, hash-gated vs DuckDB's LEFT JOIN.
    QueryDef(
      "j_routed_left",
      (s, dir) => {
        import graft.operators.Joins
        import graft.operators.Joins.RouteConfig
        val orders = Tables.orders(s, dir)
        val cust = Tables.customer(s, dir).filter(col("c_nationkey") === 1)
        def agg(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(coalesce(col("c_custkey"), lit(-1L)).as("ckey"))
            .agg(count(lit(1)).as("n_orders"),
              Exact.dsum(col("o_totalprice")).as("sum_price"))
            .orderBy("ckey")
        val regimes = Seq(
          "broadcast" -> RouteConfig(),
          "salted" -> RouteConfig(broadcastMaxRows = 0,
            skewHotFraction = 0.0),
          "shuffle" -> RouteConfig(broadcastMaxRows = 0,
            skewHotFraction = 1.1, bloomMaxMatchFraction = 0.0))
        val results = regimes.map { case (want, cfg) =>
          val rj = Joins.routed(orders, cust,
            Seq("o_custkey"), Seq("c_custkey"), cfg, "left")
          require(rj.decision.strategy == want,
            s"left routing drifted: forced $want, router picked " +
              s"${rj.decision.strategy} (${rj.decision.reason})")
          (want, agg(rj.df))
        }
        val base = results.head._2.collect().toSeq
        results.tail.foreach { case (name, df) =>
          require(df.collect().toSeq == base,
            s"routed left regime $name differs from ${results.head._1}")
        }
        results.head._2
      },
      Some(s"""SELECT COALESCE(c_custkey, -1) AS ckey,
              |  CAST(COUNT(*) AS BIGINT) AS n_orders,
              |  ${Exact.sqlDsum("o_totalprice")} AS sum_price
              |FROM orders LEFT JOIN
              |  (SELECT * FROM customer WHERE c_nationkey = 1) c
              |  ON o_custkey = c_custkey
              |GROUP BY 1 ORDER BY ckey""".stripMargin)),

    // FULL-OUTER routing (r14): both sides carry injected null keys — the
    // classic outer skew (every hot NULL hashes to one reducer) — and the
    // router splits BOTH null masses around a non-null full-outer core,
    // unioned back null-extended. Unmatched rows from either side land in
    // the COALESCE sentinel groups; hash-gated vs DuckDB's FULL JOIN.
    QueryDef(
      "j_routed_full",
      (s, dir) => {
        import graft.operators.Joins
        import graft.operators.Joins.RouteConfig
        val orders = Tables.orders(s, dir).select(
          when(col("o_orderkey") % 13 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")).as("ok"),
          col("o_totalprice"))
        val cust = Tables.customer(s, dir).filter(col("c_nationkey") === 1)
          .select(
            when(col("c_custkey") % 7 === 0, lit(null).cast("long"))
              .otherwise(col("c_custkey")).as("ck"),
            col("c_acctbal"))
        val rj = Joins.routed(orders, cust, Seq("ok"), Seq("ck"),
          RouteConfig(), "full")
        require(rj.decision.strategy == "shuffle" &&
          rj.decision.reason.contains("null-keyed rows split"),
          s"full routing drifted: ${rj.decision.reason}")
        rj.df
          .groupBy(coalesce(col("ok"), lit(-1L)).as("okey"),
            coalesce(col("ck"), lit(-2L)).as("ckey"))
          .agg(count(lit(1)).as("n"),
            Exact.dsum(col("o_totalprice")).as("sum_price"),
            Exact.dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy("okey", "ckey")
      },
      Some(s"""WITH o AS (
              |  SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL
              |              ELSE o_custkey END AS ok, o_totalprice
              |  FROM orders),
              |c AS (
              |  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
              |              ELSE c_custkey END AS ck, c_acctbal
              |  FROM customer WHERE c_nationkey = 1)
              |SELECT COALESCE(ok, -1) AS okey, COALESCE(ck, -2) AS ckey,
              |  CAST(COUNT(*) AS BIGINT) AS n,
              |  ${Exact.sqlDsum("o_totalprice")} AS sum_price,
              |  ${Exact.sqlDsum("c_acctbal")} AS sum_bal
              |FROM o FULL JOIN c ON ok = ck
              |GROUP BY 1, 2 ORDER BY okey, ckey""".stripMargin)),
  )
}
