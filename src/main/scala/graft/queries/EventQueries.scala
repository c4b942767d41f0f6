package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time operators over the `events` table — the batch forms of the streaming
  * surface (SURVEY §2.8): tumbling windows, sessionization, and semi-structured
  * (JSON) extraction. The same expressions run under Structured Streaming with a
  * watermark on `ts` (see graft.streaming); here they are verified in batch against
  * the DuckDB oracle.
  *
  * Time arithmetic is integer µs (`tus` == DuckDB `epoch_us(ts)`), derived by
  * physical-type dispatch in [[Tables.eventsUs]]; see [[WindowQueries]] for why.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(s, dir)

  /** The K unrolled DuckDB power-iteration rounds shared by the two
    * PageRank oracles (fixed-K and convergence-terminated) — one source of
    * truth so the two can never drift. `oneMinusD` is interpolated so both
    * engines parse the exact same binary double. Assumes CTEs `nodes`,
    * `nn(n)`, `deg`, `edges`, `r0` are in scope. */
  private def pagerankSteps(iters: Int, d: Double): String = {
    val oneMinusD = 1.0 - d
    (1 to iters).map { k =>
      s"""dang$k AS MATERIALIZED (
         |  SELECT CAST(COALESCE(SUM(r_mc), 0) AS BIGINT) AS dang_mc
         |  FROM r${k - 1} LEFT JOIN deg USING (node) WHERE deg IS NULL),
         |ins$k AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    CAST(SUM(CAST(round(r.r_mc / deg.deg) AS BIGINT)) AS BIGINT)
         |      AS in_mc
         |  FROM r${k - 1} r JOIN deg ON deg.node = r.node
         |  JOIN edges e ON e.src = r.node
         |  GROUP BY e.dst),
         |r$k AS MATERIALIZED (
         |  SELECT nodes.node,
         |    CAST(round($oneMinusD * 1000000000000 / n +
         |      $d * (COALESCE(in_mc, 0) + dang_mc / n)) AS BIGINT) AS r_mc
         |  FROM nodes LEFT JOIN ins$k USING (node), dang$k, nn)""".stripMargin
    }.mkString(",\n")
  }

  val defs: Seq[QueryDef] = Seq(

    // Tumbling 1-hour window aggregation (streaming form:
    // groupBy(window($"ts", "1 hour"), $"event_type"))
    QueryDef(
      "e_tumbling_hourly",
      (s, dir) =>
        ev(s, dir)
          .withColumn("hour_s", expr("(tus div 3600000000) * 3600"))
          .groupBy("hour_s", "event_type")
          .agg(count(lit(1)).as("cnt"),
            Exact.dsum(col("value")).as("sum_value"))
          .orderBy("hour_s", "event_type"),
      Some(s"""SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_s, event_type,
              |  CAST(COUNT(*) AS BIGINT) AS cnt,
              |  ${Exact.sqlDsum("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin)),

    // Sessionization with a 30-minute inactivity gap (streaming form: session_window /
    // flatMapGroupsWithState). Classic gaps-and-islands: lag → new-session flag →
    // running sum.
    QueryDef(
      "e_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val run = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir)
          .withColumn("new_sess",
            when(col("tus") - lag("tus", 1).over(byUser) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum("new_sess").over(run))
          .groupBy("user_id")
          .agg((max("sess_id") + 1).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH flags AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS tus,
             |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1)
             |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |         > 1800000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |sess AS (
             |  SELECT user_id,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS sess_id
             |  FROM flags)
             |SELECT user_id, CAST(MAX(sess_id) + 1 AS BIGINT) AS n_sessions,
             |       CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Sliding (hopping) 1-hour window every 30 min: each event lands in two
    // windows (streaming form: window($"ts", "1 hour", "30 minutes")).
    // Expressed relationally as an explode over the two covering window starts.
    QueryDef(
      "e_sliding_hourly",
      (s, dir) =>
        ev(s, dir)
          .withColumn("win_start", explode(array(
            expr("(tus div 1800000000) * 1800"),
            expr("(tus div 1800000000) * 1800 - 1800"))))
          .groupBy("win_start")
          .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_value"))
          .orderBy("win_start"),
      Some(s"""SELECT win_start, CAST(COUNT(*) AS BIGINT) AS cnt,
              |  ${Exact.sqlDsum("value")} AS sum_value
              |FROM (
              |  SELECT unnest([(epoch_us(ts) // 1800000000) * 1800,
              |                 (epoch_us(ts) // 1800000000) * 1800 - 1800]) AS win_start,
              |         value
              |  FROM events)
              |GROUP BY win_start ORDER BY win_start""".stripMargin)),

    // Semi-structured JSON extraction (props column) + aggregation.
    QueryDef(
      "e_json_extract",
      (s, dir) =>
        ev(s, dir)
          .withColumn("k_val", get_json_object(col("props"), "$.k").cast("bigint"))
          .groupBy("event_type")
          .agg(sum("k_val").as("sum_k"),
            count(lit(1)).as("cnt"),
            max("k_val").as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(COUNT(*) AS BIGINT) AS cnt,
             |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Event-time interval join (attribution): for each purchase, how many
    // views by the same user in the preceding 10 minutes. The batch twin of
    // the stream-stream join in streaming.EventStreams.attributeWithin —
    // equi-key + time-range predicate, integer-µs arithmetic. At scale the
    // equi-key carries the shuffle; the range condition is a post-join
    // filter, and the SAME predicate bounds streaming state retention.
    QueryDef(
      "e_interval_join",
      (s, dir) => {
        val base = ev(s, dir)
        val views = base.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("tus").as("vt"))
        val purchases = base.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tus").as("pt"))
        purchases
          .join(views,
            col("user_id") === col("v_user") &&
              col("vt") < col("pt") &&
              col("vt") >= col("pt") - 600000000L,
            "left")
          .groupBy("event_id", "user_id")
          .agg(count(col("vt")).as("n_views_10m"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id,
             |  CAST(COUNT(v.vt) AS BIGINT) AS n_views_10m
             |FROM (SELECT event_id, user_id, epoch_us(ts) AS pt
             |      FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT user_id AS v_user, epoch_us(ts) AS vt
             |           FROM events WHERE event_type = 'view') v
             |  ON p.user_id = v.v_user AND v.vt < p.pt AND v.vt >= p.pt - 600000000
             |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin)),

    // Ordered funnel (view → click → purchase, strictly increasing event
    // time): classic sequential-pattern analytics. Stage anchors are
    // "earliest X after the previous stage's anchor", computed as chained
    // conditional mins per user — one exchange on user_id, the window specs
    // share it.
    QueryDef(
      "e_funnel",
      (s, dir) => {
        val wu = Window.partitionBy("user_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val staged = ev(s, dir)
          .withColumn("first_view",
            min(when(col("event_type") === "view", col("tus"))).over(wu))
          .withColumn("first_click",
            min(when(col("event_type") === "click" &&
              col("tus") > col("first_view"), col("tus"))).over(wu))
          .withColumn("first_purchase",
            min(when(col("event_type") === "purchase" &&
              col("tus") > col("first_click"), col("tus"))).over(wu))
        staged.groupBy("user_id")
          .agg(max("first_view").as("v"), max("first_click").as("c"),
            max("first_purchase").as("p"))
          .agg(
            count(lit(1)).as("n_users"),
            count(col("v")).as("n_viewed"),
            count(col("c")).as("n_clicked_after_view"),
            count(col("p")).as("n_purchased_after_click"))
      },
      Some("""WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
             |s1 AS (
             |  SELECT user_id,
             |    MIN(CASE WHEN event_type = 'view' THEN tus END) AS v
             |  FROM t GROUP BY user_id),
             |s2 AS (
             |  SELECT t.user_id, s1.v,
             |    MIN(CASE WHEN t.event_type = 'click' AND t.tus > s1.v
             |        THEN t.tus END) AS c
             |  FROM t JOIN s1 ON t.user_id = s1.user_id GROUP BY t.user_id, s1.v),
             |s3 AS (
             |  SELECT t.user_id, s2.v, s2.c,
             |    MIN(CASE WHEN t.event_type = 'purchase' AND t.tus > s2.c
             |        THEN t.tus END) AS p
             |  FROM t JOIN s2 ON t.user_id = s2.user_id GROUP BY t.user_id, s2.v, s2.c)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             |  CAST(COUNT(v) AS BIGINT) AS n_viewed,
             |  CAST(COUNT(c) AS BIGINT) AS n_clicked_after_view,
             |  CAST(COUNT(p) AS BIGINT) AS n_purchased_after_click
             |FROM s3""".stripMargin)),

    // Cohort retention: users grouped by first-seen day, counted per
    // day-offset of later activity (integer epoch-day arithmetic).
    QueryDef(
      "e_retention",
      (s, dir) => {
        val days = ev(s, dir)
          .select(col("user_id"), expr("tus div 86400000000").as("day"))
          .distinct()
        val cohorts = days.groupBy("user_id").agg(min("day").as("cohort_day"))
        days.join(cohorts, Seq("user_id"))
          .withColumn("day_offset", col("day") - col("cohort_day"))
          .groupBy("cohort_day", "day_offset")
          .agg(countDistinct("user_id").as("n_active"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
             |  FROM events),
             |cohorts AS (
             |  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
             |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
             |  CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_active
             |FROM days d JOIN cohorts c ON d.user_id = c.user_id
             |GROUP BY c.cohort_day, d.day - c.cohort_day
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // RFM segmentation: per-user Recency (last purchase time) / Frequency
    // (purchase count) / Monetary (exact-decimal spend), each cut into
    // quartiles with ntile over a total order (metric, user_id — the unique
    // tie-break makes ntile deterministic on both engines), combined into
    // the classic 3-digit RFM code.
    QueryDef(
      "e_rfm",
      (s, dir) => {
        val w = (c: Column) => Window.orderBy(c.desc, col("user_id"))
        ev(s, dir).filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(max("tus").as("last_tus"),
            count(lit(1)).as("freq"),
            Exact.dsum(col("value")).as("monetary"))
          .select(col("user_id"), col("last_tus"), col("freq"), col("monetary"),
            ntile(4).over(w(col("last_tus"))).as("r_q"),
            ntile(4).over(w(col("freq"))).as("f_q"),
            ntile(4).over(w(col("monetary"))).as("m_q"))
          .withColumn("rfm", col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
          .orderBy("user_id")
      },
      Some(s"""WITH base AS (
              |  SELECT user_id, MAX(epoch_us(ts)) AS last_tus,
              |    CAST(COUNT(*) AS BIGINT) AS freq,
              |    ${Exact.sqlDsum("value")} AS monetary
              |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
              |cut AS (
              |  SELECT user_id, last_tus, freq, monetary,
              |    CAST(NTILE(4) OVER (ORDER BY last_tus DESC, user_id) AS INT) AS r_q,
              |    CAST(NTILE(4) OVER (ORDER BY freq DESC, user_id) AS INT) AS f_q,
              |    CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m_q
              |  FROM base)
              |SELECT user_id, last_tus, freq, monetary, r_q, f_q, m_q,
              |  r_q * 100 + f_q * 10 + m_q AS rfm
              |FROM cut ORDER BY user_id""".stripMargin)),

    // Spark 4 VARIANT ingestion: parse the JSON props column once into the
    // binary semi-structured type, then extract typed fields with
    // variant_get (missing paths -> NULL via try_variant_get). VARIANT keeps
    // the parse cost at ingestion instead of per-extraction — the modern
    // replacement for repeated get_json_object string parsing. The oracle
    // states the plain-JSON equivalent.
    QueryDef(
      "f_variant",
      (s, dir) =>
        ev(s, dir)
          .withColumn("v", expr("parse_json(props)"))
          .select(col("event_id"),
            expr("variant_get(v, '$.k', 'bigint')").as("k_val"),
            expr("try_variant_get(v, '$.missing', 'bigint')").as("k_missing"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
             |  CAST(json_extract(props, '$.missing') AS BIGINT) AS k_missing
             |FROM events ORDER BY event_id""".stripMargin)),

    // Backward as-of join: each purchase picks up the most recent click at or
    // before it, per user ("last touch attribution"). Oracled against DuckDB's
    // native ASOF LEFT JOIN; the Spark side is graft.operators.AsofJoin —
    // union-tag + one windowed pass, a single key exchange, no range blow-up.
    // The click side is pre-aggregated to one row per (user, µs) because both
    // engines are tie-arbitrary under duplicate right timestamps.
    QueryDef(
      "e_asof_join",
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .groupBy("user_id", "tus")
          .agg(max("event_id").as("click_id"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "tus")
        graft.operators.AsofJoin
          .backward(purchases, clicks, Seq("user_id"), "tus", "tus",
            Seq("click_id"), matchedTimeCol = "click_tus")
          .select(col("event_id"), col("user_id"), col("tus"), col("click_id"),
            (col("tus") - col("click_tus")).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (
             |  SELECT user_id, epoch_us(ts) AS ctus, MAX(event_id) AS click_id
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |purchases AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS tus
             |  FROM events WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, p.tus, c.click_id,
             |       p.tus - c.ctus AS gap_us
             |FROM purchases p ASOF LEFT JOIN clicks c
             |  ON p.user_id = c.user_id AND p.tus >= c.ctus
             |ORDER BY p.event_id""".stripMargin)),

    // As-of join with a tolerance (pandas merge_asof's `tolerance=`): a click
    // counts only within the last 30 minutes; staler matches are nulled but
    // the purchase row survives. Oracled as the plain ASOF join with a gap
    // CASE — the operator applies the bound inside the same windowed pass.
    QueryDef(
      "e_asof_tolerance",
      (s, dir) => {
        val e = ev(s, dir)
        val tolUs = 1800L * 1000000L // 30 min in µs
        val clicks = e.filter(col("event_type") === "click")
          .groupBy("user_id", "tus")
          .agg(max("event_id").as("click_id"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "tus")
        graft.operators.AsofJoin
          .backward(purchases, clicks, Seq("user_id"), "tus", "tus",
            Seq("click_id"), matchedTimeCol = "click_tus",
            tolerance = Some(tolUs))
          .select(col("event_id"), col("user_id"), col("tus"), col("click_id"),
            (col("tus") - col("click_tus")).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""WITH clicks AS (
             |  SELECT user_id, epoch_us(ts) AS ctus, MAX(event_id) AS click_id
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |purchases AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS tus
             |  FROM events WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, p.tus,
             |  CASE WHEN p.tus - c.ctus <= 1800000000 THEN c.click_id END AS click_id,
             |  CASE WHEN p.tus - c.ctus <= 1800000000 THEN p.tus - c.ctus END AS gap_us
             |FROM purchases p ASOF LEFT JOIN clicks c
             |  ON p.user_id = c.user_id AND p.tus >= c.ctus
             |ORDER BY p.event_id""".stripMargin)),

    // PageRank centrality of the event-TYPE transition graph: edges are
    // consecutive event types within each user's stream (which step of the
    // journey funnels attention — the Markov-chain view of user behavior).
    // Edge derivation is per-user lag (no global window); the iteration is
    // graft.operators.PageRank — K=8 fixed rounds in FIXED-POINT pico-unit
    // BIGINTs (exact integer sums; the only inexact ops are divisions of
    // identical inputs + round-to-integer, which both engines decide
    // identically). The oracle mirrors the iteration as K UNROLLED DuckDB
    // CTEs with the same association — final doubles hash-match with no
    // rounding tolerance.
    {
      val iters = 8
      val d = 0.85
      val steps = pagerankSteps(iters, d)
      QueryDef(
        "e_pagerank_types",
        (s, dir) => {
          val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
          val edges = ev(s, dir)
            .select(col("user_id"), col("tus"), col("event_id"), col("event_type"))
            .withColumn("src", lag("event_type", 1).over(w))
            .filter(col("src").isNotNull)
            .select(col("src"), col("event_type").as("dst"))
          graft.operators.PageRank.run(edges, iterations = iters, damping = d)
            .orderBy("node")
        },
        Some(s"""WITH ev AS MATERIALIZED (
               |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
               |  FROM events),
               |edges AS MATERIALIZED (
               |  SELECT src, dst FROM (
               |    SELECT lag(event_type) OVER (PARTITION BY user_id
               |             ORDER BY tus, event_id) AS src,
               |           event_type AS dst
               |    FROM ev)
               |  WHERE src IS NOT NULL),
               |nodes AS MATERIALIZED (
               |  SELECT DISTINCT node FROM (
               |    SELECT src AS node FROM edges
               |    UNION ALL SELECT dst FROM edges)),
               |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
               |deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
               |        FROM edges GROUP BY src),
               |r0 AS MATERIALIZED (SELECT node,
               |         CAST(round(1000000000000.0 / n) AS BIGINT) AS r_mc
               |       FROM nodes, nn),
               |$steps
               |SELECT node, CAST(r_mc AS DOUBLE) / 1000000000000.0 AS rank
               |FROM r$iters ORDER BY node""".stripMargin)
      )
    },

    // CONVERGENCE-terminated PageRank: the early-exit decision itself is
    // cross-engine-verified, not just the fixed-K arithmetic. The engine
    // runs graft.operators.PageRank.runUntilConverged (stop when the exact
    // BIGINT pico-unit L1 delta between consecutive rounds is <= tol,
    // capped at maxIter) and stamps the round count it actually ran as a
    // `rounds` column. The oracle does NOT pin that count: it unrolls all
    // maxIter rounds, computes every round's delta with the same exact
    // integer arithmetic, re-derives the stopping round R = min{k :
    // delta_k <= tolPico} (cap if none), and selects round R's ranks plus
    // R itself. Because the per-round ranks are bit-equal across engines
    // (see e_pagerank_types) the deltas are too, so both engines must
    // agree on R — a hash mismatch here means the STOPPING RULE diverged,
    // which is exactly what this row gates. Self-adapting: the same SQL is
    // correct at any sf (R may differ between sf0.01 and sf1; both sides
    // re-derive it from the data).
    {
      val maxIter = 24
      val d = 0.85
      val tol = 1e-7 // rank-mass units; 1e5 pico-units of total movement
      val tolPico = (tol * graft.operators.PageRank.Unit).toLong
      val steps = pagerankSteps(maxIter, d)
      val deltas = (1 to maxIter).map { k =>
        s"""dl$k AS MATERIALIZED (
           |  SELECT CAST(SUM(ABS(a.r_mc - b.r_mc)) AS BIGINT) AS d
           |  FROM r$k a JOIN r${k - 1} b USING (node))""".stripMargin
      }.mkString(",\n")
      val deltaRows = (1 to maxIter)
        .map(k => s"SELECT $k AS k, d FROM dl$k").mkString("\nUNION ALL ")
      val rankRows = (1 to maxIter)
        .map(k => s"SELECT $k AS k, node, r_mc FROM r$k").mkString("\nUNION ALL ")
      QueryDef(
        "e_pagerank_converged",
        (s, dir) => {
          val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
          val edges = ev(s, dir)
            .select(col("user_id"), col("tus"), col("event_id"), col("event_type"))
            .withColumn("src", lag("event_type", 1).over(w))
            .filter(col("src").isNotNull)
            .select(col("src"), col("event_type").as("dst"))
          val (ranks, rounds) = graft.operators.PageRank.runUntilConverged(
            edges, tol = tol, maxIterations = maxIter, damping = d)
          ranks.withColumn("rounds", lit(rounds)).orderBy("node")
        },
        Some(s"""WITH ev AS MATERIALIZED (
               |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
               |  FROM events),
               |edges AS MATERIALIZED (
               |  SELECT src, dst FROM (
               |    SELECT lag(event_type) OVER (PARTITION BY user_id
               |             ORDER BY tus, event_id) AS src,
               |           event_type AS dst
               |    FROM ev)
               |  WHERE src IS NOT NULL),
               |nodes AS MATERIALIZED (
               |  SELECT DISTINCT node FROM (
               |    SELECT src AS node FROM edges
               |    UNION ALL SELECT dst FROM edges)),
               |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
               |deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
               |        FROM edges GROUP BY src),
               |r0 AS MATERIALIZED (SELECT node,
               |         CAST(round(1000000000000.0 / n) AS BIGINT) AS r_mc
               |       FROM nodes, nn),
               |$steps,
               |$deltas,
               |deltas AS MATERIALIZED (
               |$deltaRows),
               |stopk AS MATERIALIZED (
               |  SELECT CAST(COALESCE(MIN(k), $maxIter) AS INTEGER) AS k
               |  FROM deltas WHERE d <= $tolPico),
               |allr AS (
               |$rankRows)
               |SELECT a.node, CAST(a.r_mc AS DOUBLE) / 1000000000000.0 AS rank,
               |  s.k AS rounds
               |FROM allr a, stopk s WHERE a.k = s.k
               |ORDER BY a.node""".stripMargin)
      )
    },

    // Watermark late-data policy, expressed in batch with an exact oracle:
    // which rows would Structured Streaming DROP under
    // `withWatermark(ts, 30 min)` if the events arrived in a deliberately
    // out-of-order sequence? Arrival order is deterministic disorder
    // derived from the data itself — 16-event chunks played back in
    // reverse time order (the testdata's ts is monotone in event_id, so a
    // shuffle must be synthesized to exercise lateness at all). The
    // watermark is the streaming definition exactly: the running MAX event
    // time over all PRIOR arrivals (global, key-independent), minus the
    // delay; a row is late iff tus < wm − D. That row-by-row advance is
    // what a one-row-per-micro-batch stream produces, and
    // `LateArrivalsSpec` asserts the real streaming dedup drop set equals
    // this batch rule on the same replay. Output: the dropped rows with
    // how late each was.
    //
    // The global ordered window IS the semantics here (a watermark is a
    // single global frontier — inherently sequential); the streaming
    // implementation is the scale path, this batch twin exists as the
    // oracle. Allow-listed in PlanSweepSpec like the other global-frontier
    // operators.
    {
      val dUs = 1800000000L // 30-minute watermark delay, in µs
      QueryDef(
        "e_late_arrivals",
        (s, dir) => {
          val arrival = Window.orderBy(
            expr("event_id div 16").asc, expr("event_id % 16").desc)
          val wmW = Window.orderBy("arrival")
            .rowsBetween(Window.unboundedPreceding, -1)
          ev(s, dir)
            .select(col("event_id"), col("user_id"), col("tus"))
            .withColumn("arrival", row_number().over(arrival))
            .withColumn("wm_high", max(col("tus")).over(wmW))
            .where(col("tus") < col("wm_high") - lit(dUs))
            .select(col("event_id"), col("user_id"), col("tus"),
              (col("wm_high") - lit(dUs) - col("tus")).as("late_us"))
            .orderBy("event_id")
        },
        Some(s"""WITH arr AS (
                |  SELECT event_id, user_id, epoch_us(ts) AS tus,
                |    ROW_NUMBER() OVER (ORDER BY event_id // 16 ASC,
                |                                event_id % 16 DESC) AS arrival
                |  FROM events),
                |seq AS (
                |  SELECT *, MAX(tus) OVER (ORDER BY arrival
                |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_high
                |  FROM arr)
                |SELECT event_id, user_id, tus, wm_high - $dUs - tus AS late_us
                |FROM seq WHERE tus < wm_high - $dUs
                |ORDER BY event_id""".stripMargin))
    },
  )
}
