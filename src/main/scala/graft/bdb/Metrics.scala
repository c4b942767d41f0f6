package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Player metrics + scorecards (SURVEY §7 step 8; reference: bdb2026/metrics.py,
  * Phase3 notebook).
  */
object Metrics {

  /** A2 — per-play residual rollup feeding TrueSpeed (reference:
    * metrics.py:13-57: mean/median/sum/MAE/RMSE of actual−predicted).
    * Median is exact via Percentiles.ranked/medianAgg — a streaming window
    * plus a codegen conditional agg, bit-identical to the builtin
    * `percentile` (GoldenParitySpec still reproduces the reference CSV) but
    * with NO per-group object state: plays are millions of small groups, the
    * regime where the builtin's per-group value→count maps drive
    * ObjectHashAggregate into its sort-based fallback (measured on the a2
    * registry twin: 231 cpu_s at 30×, exponent 1.27). Residuals are non-null
    * by construction (prediction-join output); the window form would rank
    * nulls first rather than ignore them.
    */
  def trueSpeedPerPlay(residuals: DataFrame): DataFrame =
    graft.operators.Percentiles
      .ranked(residuals, Seq("game_id", "play_id", "nfl_id"), "residual")
      .groupBy("game_id", "play_id", "nfl_id")
      .agg(
        avg("residual").as("residual_mean"),
        graft.operators.Percentiles.medianAgg("residual").as("residual_median"),
        sum("residual").as("residual_sum"),
        avg(abs(col("residual"))).as("residual_mae"),
        sqrt(avg(col("residual") * col("residual"))).as("residual_rmse"),
        count(lit(1)).as("n_frames"))

  /** Per-player TrueSpeed = mean of per-play residual means, min-max scaled to
    * 0-100 (reference: metrics.py:129-195). Positive residual = faster-than-
    * expected convergence.
    *
    * Standalone utility: the 0-100 scale spans WHATEVER subset you pass. For
    * scorecard parity with the reference, use [[scorecard]] — it filters junk
    * routes and applies the volume threshold BEFORE scaling (metrics.py
    * normalizes only within the qualified subset).
    */
  def trueSpeedPerPlayer(perPlay: DataFrame): DataFrame = {
    val raw = perPlay.groupBy("nfl_id")
      .agg(avg("residual_mean").as("true_speed_raw"),
        count(lit(1)).as("plays_scored"))
    Normalize.scaleTo100(raw, "true_speed_raw", "true_speed")
  }

  /** RouteExecution: per-player mean RouteExecIQ min-max scaled to 0-100 and
    * rounded to 1 dp (reference: metrics.py:342-344 — the scorecard converts
    * RouteExecIQ into the 0-100 "RouteExecution" index at normalize time).
    *
    * Standalone utility — same caveat as [[trueSpeedPerPlayer]]: the scale
    * spans the given subset; [[scorecard]] reproduces the reference's
    * filter-then-scale ordering.
    */
  def routeExecutionPerPlayer(withIq: DataFrame): DataFrame = {
    val perPlayer = withIq.groupBy("nfl_id")
      .agg(avg("route_exec_iq").as("route_exec_iq_mean"))
    Normalize.scaleTo100(perPlayer, "route_exec_iq_mean", "route_execution_raw")
      .withColumn("route_execution", round(col("route_execution_raw"), 1))
      .drop("route_execution_raw")
  }

  /** A4 + A12 + W6 + W7 — production scorecard (reference: metrics.py:198-367),
    * reproducing build_truespeed_scorecard's ordering exactly:
    *
    *  1. junk-route filter on the play-level frame (metrics.py:289-291);
    *  2. process metrics per player over the SCORED subset (residual_mean
    *     present): mean per-play TrueSpeed raw + mean RouteExecIQ
    *     (metrics.py:294-304);
    *  3. production aggs per player over all junk-filtered plays
    *     (metrics.py:306-323);
    *  4. inner join process × production;
    *  5. volume threshold targets > maxTargets·volumeFrac (metrics.py:327-331);
    *  6. min-max 0-100 scaling of TrueSpeed and RouteExecIQ→RouteExecution
    *     computed WITHIN the qualified subset only, rounded to 1 dp
    *     (metrics.py:333-344) — raw values preserved in `true_speed_raw`;
    *  7. min-method rank on the scaled TrueSpeed (metrics.py:347-348;
    *     Spark's `rank()` == pandas method="min").
    *
    * @param plays one row per (player, play): nfl_id, player_name,
    *              pass_result, yards_gained, expected_points_added; a
    *              `residual_mean` per-play process column (null for unscored
    *              plays); optionally `route_of_targeted_receiver` (enables the
    *              junk filter) and `route_exec_iq` (enables RouteExecution).
    */
  def scorecard(plays: DataFrame, volumeFrac: Double = 0.5,
      junkRoutes: Seq[String] = Schemas.junkRoutes): DataFrame = {
    val hasRoute = plays.columns.contains("route_of_targeted_receiver")
    val hasIq = plays.columns.contains("route_exec_iq")
    val kept =
      if (hasRoute)
        plays.filter(!col("route_of_targeted_receiver").isin(junkRoutes: _*))
      else plays

    val production = kept
      .groupBy("nfl_id", "player_name")
      .agg(
        count(lit(1)).as("total_targets"),
        sum("yards_gained").as("total_yards"),
        sum("expected_points_added").as("total_epa"),
        avg((col("pass_result") === "C").cast("double")).as("catch_rate"),
        sum((col("yards_gained") >= 20).cast("long")).as("explosive_plays"),
        avg((col("expected_points_added") > 0).cast("double")).as("success_rate"))
      .withColumn("yards_per_target", col("total_yards") / col("total_targets"))
      .withColumn("epa_per_target", col("total_epa") / col("total_targets"))

    val iqAggs =
      if (hasIq) Seq(avg("route_exec_iq").as("route_exec_iq_mean")) else Nil
    val processAggs = Seq(
      avg("residual_mean").as("true_speed_raw"),
      count(lit(1)).as("plays_scored")) ++ iqAggs
    val process = kept.filter(col("residual_mean").isNotNull)
      .groupBy("nfl_id", "player_name")
      .agg(processAggs.head, processAggs.tail: _*)

    // HAVING against a global agg: threshold via unpartitioned window (A12).
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val qualified = process.join(production, Seq("nfl_id", "player_name"))
      .withColumn("max_targets", max("total_targets").over(wAll))
      .filter(col("total_targets") > col("max_targets") * volumeFrac)
      .drop("max_targets")

    // Scale INSIDE the qualified subset (the fix the round-1 advisor flagged:
    // scaling before the filters stretches the 0-100 range over players the
    // scorecard then drops, shifting every published index).
    val tsScaled = Normalize
      .scaleTo100(qualified, "true_speed_raw", "__ts")
      .withColumn("true_speed", round(col("__ts"), 1)).drop("__ts")
    val scaled =
      if (hasIq)
        Normalize.scaleTo100(tsScaled, "route_exec_iq_mean", "__re")
          .withColumn("route_execution", round(col("__re"), 1)).drop("__re")
      else tsScaled
    scaled.withColumn("rank", rank().over(Window.orderBy(col("true_speed").desc)))
  }

  /** P8 — hybrid AirPlayIQ piecewise score (reference: Phase3 cell 18
    * calculate_hybrid_airplay_iq): difficulty multiplier from separation,
    * open vs contested branch — nested when/otherwise, no UDF.
    */
  def hybridAirPlayIq(df: DataFrame,
      sepCol: String = "defender_separation",
      convCol: String = "residual_mean"): DataFrame = {
    val difficulty =
      when(col(sepCol) < 1.0, 1.5)
        .when(col(sepCol) < 3.0, 1.2)
        .otherwise(1.0)
    val base =
      when(col(sepCol) >= 3.0, // open: reward convergence efficiency
        lit(50.0) + col(convCol) * 100.0)
        .otherwise( // contested: reward beating expectation under pressure
          lit(50.0) + col(convCol) * 150.0)
    df.withColumn("air_play_iq",
      greatest(least(base * difficulty, lit(100.0)), lit(0.0)))
  }

  /** W8 — percentile archetypes (reference: insights cell 2): style percentiles
    * per metric, bucketed into named archetypes.
    */
  def archetypes(scored: DataFrame): DataFrame = {
    def pct(c: String) = percent_rank().over(Window.orderBy(col(c)))
    scored
      .withColumn("speed_pct", pct("true_speed"))
      .withColumn("volume_pct", pct("total_targets"))
      .withColumn("efficiency_pct", pct("yards_per_target"))
      .withColumn("archetype",
        when(col("speed_pct") >= 0.75 && col("efficiency_pct") >= 0.75, "Elite Separator")
          .when(col("speed_pct") >= 0.75, "Burner")
          .when(col("volume_pct") >= 0.75, "Volume Target")
          .when(col("efficiency_pct") >= 0.75, "Efficient Specialist")
          .otherwise("Depth Piece"))
  }

  /** A3 — per-play mean Euclidean distance between two trajectories of the
    * same player (reference: metrics.py:60-94 — e.g. actual vs predicted
    * path). Inputs carry (game_id, play_id, nfl_id, frame_id, x, y).
    */
  def trajectoryDeviation(a: DataFrame, b: DataFrame): DataFrame = {
    val bx = b.select(col("game_id"), col("play_id"), col("nfl_id"),
      col("frame_id"), col("x").as("bx"), col("y").as("by"))
    a.join(bx, Schemas.frameKeys)
      .groupBy(Schemas.trajectoryKeys.map(col): _*)
      .agg(avg(sqrt((col("x") - col("bx")) * (col("x") - col("bx"))
        + (col("y") - col("by")) * (col("y") - col("by"))))
        .as("trajectory_deviation"))
  }

  /** M8 — closed-form trendline fit y = slope·x + intercept from covariance /
    * variance aggregates in ONE pass (reference: viz.py:431-449 np.polyfit),
    * plus Pearson r. Returns a 1-row frame.
    */
  def trendline(df: DataFrame, xc: String, yc: String): DataFrame = {
    val x = col(xc)
    val y = col(yc)
    df.agg(
      count(lit(1)).cast("double").as("n"),
      avg(x).as("mx"), avg(y).as("my"),
      avg(x * y).as("mxy"), avg(x * x).as("mxx"), avg(y * y).as("myy"))
      .select(
        ((col("mxy") - col("mx") * col("my"))
          / (col("mxx") - col("mx") * col("mx"))).as("slope"),
        (col("my") - (col("mxy") - col("mx") * col("my"))
          / (col("mxx") - col("mx") * col("mx")) * col("mx")).as("intercept"),
        ((col("mxy") - col("mx") * col("my"))
          / (sqrt(col("mxx") - col("mx") * col("mx"))
            * sqrt(col("myy") - col("my") * col("my")))).as("pearson_r"))
  }

  /** Model-beaters (reference: insights cell 4): players whose actual
    * convergence most exceeds the model's expectation — top-k by mean
    * per-play residual. */
  def modelBeaters(perPlay: DataFrame, k: Int = 10, minPlays: Long = 5): DataFrame =
    perPlay.groupBy("nfl_id")
      .agg(avg("residual_mean").as("beat_rate"), count(lit(1)).as("n_plays"))
      .filter(col("n_plays") >= minPlays)
      .orderBy(col("beat_rate").desc, col("nfl_id"))
      .limit(k)

  /** W9 — best player per route (reference: insights cell 3). */
  def topPlayerPerRoute(playerRoutes: DataFrame, metric: String): DataFrame = {
    val w = Window.partitionBy("route_of_targeted_receiver")
      .orderBy(col(metric).desc, col("nfl_id"))
    playerRoutes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }
}
