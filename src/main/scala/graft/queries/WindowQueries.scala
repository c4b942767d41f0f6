package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function operators (SURVEY §2.5) — the workhorse category: every kinematic
  * feature in the reference is a per-trajectory ordered-window op over
  * `Window.partitionBy(game,play[,player]).orderBy(frame)`. Here the trajectory is a
  * user's event stream ordered by time.
  *
  * `events.ts` arrives as whatever physical time encoding the writer chose —
  * parquet `timestamp[us]` (TimestampType) or TIMESTAMP(NANOS) surfaced as raw
  * longs under `nanosAsLong` (see [[graft.GraftSession]]). All time arithmetic
  * happens on `tus` (epoch µs BIGINT), normalized per-encoding at the reader by
  * [[Tables.eventsUs]] with truncation semantics identical to DuckDB's
  * `epoch_us(ts)`, keeping the two engines bit-identical either way.
  *
  * Scale: one hash-partition by the window key per query; Catalyst merges identical
  * window specs into a single WindowExec, so chained lag/lead/min/max over the same
  * spec sort once.
  */
object WindowQueries {

  /** events with tus (epoch µs, bigint) — matches DuckDB epoch_us(ts). */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(s, dir)

  private val byUser = Window.partitionBy("user_id").orderBy("tus", "event_id")
  private val userAll = Window.partitionBy("user_id")
    .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** DuckDB window spec equivalent to [[byUser]]. */
  private val wSql = "PARTITION BY user_id ORDER BY epoch_us(ts), event_id"

  val defs: Seq[QueryDef] = Seq(

    // W1 — lag-diff velocity (reference: dx = x - lag(x) per trajectory / 0.1 s,
    // preprocess.py:123-127)
    QueryDef(
      "w1_lag_diff",
      (s, dir) =>
        ev(s, dir)
          .select(col("event_id"),
            coalesce(col("value") - lag("value", 1).over(byUser), lit(0.0)).as("dval"),
            coalesce(col("tus") - lag("tus", 1).over(byUser), lit(0L)).as("dt_us"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |  COALESCE(value - LAG(value, 1) OVER ($wSql), 0.0) AS dval,
              |  COALESCE(epoch_us(ts) - LAG(epoch_us(ts), 1) OVER ($wSql), 0) AS dt_us
              |FROM events ORDER BY event_id""".stripMargin)),

    // W2 — lead-diff converge-rate (reference: dist[t] - dist[t+1], BDB_2026.ipynb
    // cell 80; last frame coalesces to 0)
    QueryDef(
      "w2_lead_diff",
      (s, dir) =>
        ev(s, dir)
          .select(col("event_id"),
            coalesce(col("value") - lead("value", 1).over(byUser), lit(0.0))
              .as("converge"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |  COALESCE(value - LEAD(value, 1) OVER ($wSql), 0.0) AS converge
              |FROM events ORDER BY event_id""".stripMargin)),

    // W3 + W4 — cumulative index and group-min broadcast (reference: cumcount() →
    // frame_since_throw; transform('min'), preprocess.py:195-201)
    QueryDef(
      "w3_session_index",
      (s, dir) =>
        ev(s, dir)
          .select(col("event_id"),
            (row_number().over(byUser) - 1).as("idx"),
            (col("tus") - min("tus").over(userAll)).as("t_rel_us"),
            (max("tus").over(userAll) - min("tus").over(userAll)).as("span_us"))
          .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |  CAST(ROW_NUMBER() OVER ($wSql) - 1 AS INT) AS idx,
              |  epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS t_rel_us,
              |  MAX(epoch_us(ts)) OVER (PARTITION BY user_id)
              |    - MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS span_us
              |FROM events ORDER BY event_id""".stripMargin)),

    // W5 — z-score within partition from exact window sums (reference: standardize
    // within cluster, metrics.py:97-122; population ddof=0 variant)
    QueryDef(
      "w5_zscore",
      (s, dir) => {
        val wt = Window.partitionBy("event_type")
        val n = count(lit(1)).over(wt).cast("double")
        val mean = sum(col("value").cast(Exact.dt)).over(wt).cast("double") / n
        val meanSq = sum((col("value") * col("value")).cast(Exact.dt)).over(wt)
          .cast("double") / n
        ev(s, dir)
          .withColumn("mean_v", mean)
          .withColumn("var_v", meanSq - mean * mean)
          .select(col("event_id"),
            ((col("value") - col("mean_v")) / sqrt(col("var_v"))).as("z"))
          .orderBy("event_id")
      },
      Some("""WITH t AS (
             |  SELECT event_id, value,
             |    CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE)
             |      / CAST(COUNT(*) OVER w AS DOUBLE) AS mean_v,
             |    CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE)
             |      / CAST(COUNT(*) OVER w AS DOUBLE) AS mean_sq
             |  FROM events WINDOW w AS (PARTITION BY event_type))
             |SELECT event_id, (value - mean_v) / sqrt(mean_sq - mean_v * mean_v) AS z
             |FROM t ORDER BY event_id""".stripMargin)),

    // W6 — min-max scale to 0-100, degenerate → 50 (reference: metrics.py:129-137)
    QueryDef(
      "w6_minmax_scale",
      (s, dir) => {
        val wt = Window.partitionBy("event_type")
        val mn = min("value").over(wt)
        val mx = max("value").over(wt)
        ev(s, dir)
          .select(col("event_id"),
            when(mx === mn, lit(50.0))
              .otherwise(lit(100.0) * (col("value") - mn) / (mx - mn)).as("scaled"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN 50.0
             |       ELSE 100.0 * (value - MIN(value) OVER w)
             |            / (MAX(value) OVER w - MIN(value) OVER w) END AS scaled
             |FROM events WINDOW w AS (PARTITION BY event_type)
             |ORDER BY event_id""".stripMargin)),

    // W7 — rank leaderboard (reference: rank(ascending=False, method='min') ≡ SQL
    // RANK, metrics.py:348)
    QueryDef(
      "w7_rank",
      (s, dir) => {
        val totals = Tables.orders(s, dir)
          .groupBy("o_custkey")
          .agg(Exact.dsum(col("o_totalprice")).as("total"))
        totals
          .withColumn("rnk", rank().over(Window.orderBy(col("total").desc)))
          .filter(col("rnk") <= 100)
          .orderBy("rnk", "o_custkey")
      },
      Some(s"""WITH t AS (
              |  SELECT o_custkey, ${Exact.sqlDsum("o_totalprice")} AS total
              |  FROM orders GROUP BY o_custkey)
              |SELECT o_custkey, total, CAST(RANK() OVER (ORDER BY total DESC) AS INT) AS rnk
              |FROM t QUALIFY rnk <= 100 ORDER BY rnk, o_custkey""".stripMargin)),

    // W8 — percent rank (reference: style percentiles rank(pct=True), insights cell 2)
    QueryDef(
      "w8_percent_rank",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("value", "event_id")
        ev(s, dir)
          .select(col("event_id"), percent_rank().over(w).as("pct"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pct
             |FROM events ORDER BY event_id""".stripMargin)),

    // W9 — top-k per group (reference: best player per route, insights cell 3)
    QueryDef(
      "w9_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy("event_type")
          .orderBy(col("value").desc, col("event_id"))
        ev(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("event_type", "rn", "event_id", "value")
          .orderBy("event_type", "rn")
      },
      Some("""SELECT event_type, CAST(rn AS INT) AS rn, event_id, value FROM (
             |  SELECT event_type, event_id, value,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
             |  FROM events) WHERE rn <= 3
             |ORDER BY event_type, rn""".stripMargin)),

    // W10 — ordered collect / padded sequence build (reference: last ≤25 frames per
    // play → (25,F) tensor, sequences.py:21-88). First 5 values per user, rendered as
    // a fixed-decimal string so both engines hash identically.
    QueryDef(
      "w10_ordered_collect",
      (s, dir) =>
        ev(s, dir)
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            expr("""concat_ws(',',
                   |  transform(
                   |    slice(array_sort(collect_list(struct(tus, event_id, value))), 1, 5),
                   |    x -> cast(cast(x.value AS decimal(18,2)) AS string)))"""
              .stripMargin).as("first5"))
          .orderBy("user_id"),
      Some("""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  array_to_string(
             |    list_transform(
             |      (list(value ORDER BY epoch_us(ts), event_id))[1:5],
             |      x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS first5
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Median absolute deviation per user — the robust scale estimate
    // (stddev's outlier-immune sibling): med = median(value), mad =
    // median(|value - med|). Two grouped exact medians; deterministic
    // cross-engine because both interpolate even counts as the mean of two
    // IDENTICAL doubles (2-decimal inputs), and |x - med| reproduces
    // exactly on both sides. Both medians go through Percentiles.ranked/
    // medianAgg (streaming window + codegen agg, bit-identical to the
    // builtin) — the builtin's per-user value→count object maps are the
    // ObjectHashAggregate shape the 30× scale audit flagged on a2.
    QueryDef(
      "w_mad",
      (s, dir) => {
        import graft.operators.Percentiles
        val med = Percentiles.ranked(ev(s, dir), Seq("user_id"), "value")
          .groupBy("user_id")
          .agg(Percentiles.medianAgg("value").as("med"))
        val dev = ev(s, dir).join(med, Seq("user_id"))
          .withColumn("__adev", abs(col("value") - col("med")))
        Percentiles.ranked(dev, Seq("user_id"), "__adev")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            first(col("med")).as("med"),
            Percentiles.medianAgg("__adev").as("mad"))
          .orderBy("user_id")
      },
      Some("""WITH med AS (
             |  SELECT user_id, median(value) AS med FROM events GROUP BY user_id)
             |SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  first(m.med) AS med,
             |  median(abs(e.value - m.med)) AS mad
             |FROM events e JOIN med m ON e.user_id = m.user_id
             |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin)),

    // Rolling median over a trailing 10-row frame per user: rank-based
    // window statistics, not just the algebraic ones (sum/avg). Exact
    // percentile inside a moving frame; both engines interpolate the even
    // case as the mean of the two middle values of IDENTICAL doubles, so
    // the result hash-matches unrounded.
    QueryDef(
      "w_rolling_median",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(-9, Window.currentRow)
        // collect the (bounded, ≤10-element) frame and take the median from
        // the sorted array — bit-identical to `percentile(value, 0.5)` over
        // the frame (odd n: the middle element; even n: 0.5·lo + 0.5·hi,
        // the builtin's symmetric form), but pure codegen'd array arithmetic
        // instead of the interpreted TypedImperativeAggregate the builtin
        // re-runs per frame (the registry scale audit measured ~5 µs/row on
        // it — the registry's costliest window)
        // collect_list skips nulls, so an all-null frame is EMPTY (size 0) —
        // guard it to NULL like `percentile(value, 0.5) OVER w` would return,
        // instead of element_at throwing on index 0 (r15 ADVICE; unreachable
        // with events.value's non-null contract, but not a contract this
        // query should silently depend on)
        ev(s, dir)
          .select(col("event_id"),
            array_sort(collect_list(col("value")).over(w)).as("fr"))
          .select(col("event_id"), expr(
            """CASE WHEN size(fr) = 0 THEN CAST(NULL AS DOUBLE)
              |ELSE 0.5D * element_at(fr, CAST((size(fr) + 1) DIV 2 AS INT)) +
              |     0.5D * element_at(fr, CAST(size(fr) DIV 2 + 1 AS INT))
              |END""".stripMargin).as("roll_med"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  median(value) OVER (PARTITION BY user_id
             |    ORDER BY epoch_us(ts), event_id
             |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS roll_med
             |FROM events ORDER BY event_id""".stripMargin)),

    // EWMA (exponentially weighted moving average) per user — a RECURSIVE
    // smoothing no window frame can express (y_t = αx_t + (1-α)y_{t-1}
    // needs the previous OUTPUT). Encoded as an ordered fold: collect the
    // user's values in event order, seed with the first, fold the rest.
    // Both engines fold sequentially in IEEE doubles with identical
    // association and exact binary constants (α = 0.125), so the result
    // hash-matches WITHOUT rounding. Bounded state: per-user streams here;
    // at scale, segment first (sessionize) or use the streaming state-store
    // form — the fold shape is the same.
    QueryDef(
      "w_ewma",
      (s, dir) =>
        ev(s, dir)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            expr("array_sort(collect_list(struct(tus, event_id, value)))").as("vals"))
          .select(col("user_id"), col("n_events"),
            expr("""aggregate(slice(vals, 2, size(vals)),
                   |  element_at(vals, 1).value,
                   |  (acc, x) -> 0.125D * x.value + 0.875D * acc)""".stripMargin)
              .as("ewma"))
          .orderBy("user_id"),
      Some("""WITH ordered AS (
             |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |    list(value ORDER BY epoch_us(ts), event_id) AS vals
             |  FROM events GROUP BY user_id)
             |SELECT user_id, n_events,
             |  list_reduce(vals, (acc, x) -> 0.125 * x + 0.875 * acc) AS ewma
             |FROM ordered ORDER BY user_id""".stripMargin)),

    // Value window functions: first/last/nth within the user's stream —
    // completes the window family (frame-sensitive last_value needs the
    // explicit unbounded-following frame in BOTH engines).
    QueryDef(
      "w_value_funcs",
      (s, dir) => {
        val wAll = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ev(s, dir)
          .select(col("event_id"),
            first("value").over(wAll).as("first_v"),
            last("value").over(wAll).as("last_v"),
            nth_value(col("value"), 2).over(wAll).as("second_v"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  FIRST_VALUE(value) OVER w AS first_v,
             |  LAST_VALUE(value) OVER w AS last_v,
             |  NTH_VALUE(value, 2) OVER w AS second_v
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY event_id""".stripMargin)),

    // RANGE-frame rolling window: 30-minute trailing sum/count per user —
    // the time-based frame spec (rowsBetween only covers W1-W10; this is the
    // RANGE BETWEEN form, frame bounds in µs).
    QueryDef(
      "w_range_rolling",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("tus")
          .rangeBetween(-1800000000L, 0L)
        ev(s, dir)
          .select(col("event_id"),
            sum(col("value").cast(Exact.dt)).over(w).cast("double")
              .as("rolling_sum_30m"),
            count(lit(1)).over(w).as("rolling_cnt_30m"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE) AS rolling_sum_30m,
             |  CAST(COUNT(*) OVER w AS BIGINT) AS rolling_cnt_30m
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // W11 — wrap-around angle diff + threshold count (reference: direction-change
    // count per route, routes.py:117-126). value%360 stands in for the heading.
    QueryDef(
      "w11_angle_wrap",
      (s, dir) => {
        val ang = col("value") % 360.0
        val d = abs(ang - lag(ang, 1).over(byUser))
        val wrapped = least(d, lit(360.0) - d)
        ev(s, dir)
          .withColumn("turn", wrapped)
          .groupBy("user_id")
          .agg(
            sum(when(col("turn") > 30.0, 1L).otherwise(0L)).as("big_turns"),
            count(col("turn")).as("n_diffs"))
          .orderBy("user_id")
      },
      Some(s"""WITH t AS (
              |  SELECT user_id,
              |    least(abs((value % 360.0) - LAG(value % 360.0, 1) OVER ($wSql)),
              |          360.0 - abs((value % 360.0) - LAG(value % 360.0, 1) OVER ($wSql)))
              |      AS turn
              |  FROM events)
              |SELECT user_id,
              |  CAST(SUM(CASE WHEN turn > 30.0 THEN 1 ELSE 0 END) AS BIGINT) AS big_turns,
              |  CAST(COUNT(turn) AS BIGINT) AS n_diffs
              |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ROWS-frame moving average (5-row centered window): the count-based
    // frame twin of w_range_rolling's time-based RANGE frame. Decimal-exact
    // numerator over an integer count.
    QueryDef(
      "w_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(-2, 2)
        ev(s, dir)
          .select(col("event_id"), col("user_id"),
            (sum(col("value").cast(Exact.dt)).over(w).cast("double")
              / count(lit(1)).over(w)).as("ma5"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE)
             |    / CAST(COUNT(*) OVER w AS DOUBLE) AS ma5
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
             |ORDER BY event_id""".stripMargin)),

    // NTILE quartiles per group (SQL-standard bucket arithmetic is identical
    // in both engines given a total order — unique (orderkey, linenumber)
    // tiebreak).
    QueryDef(
      "w_ntile",
      (s, dir) => {
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            ntile(4).over(w).as("price_quartile"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag,
             |  CAST(NTILE(4) OVER (PARTITION BY l_returnflag
             |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS INT)
             |    AS price_quartile
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),
  )
}
