package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational sequence features: the LSTM's memory, re-expressed as lags,
  * EWMAs, and rolling windows over the trajectory ordering.
  *
  * The reference's convergence model is a Keras LSTM
  * (reference: bdb2026/models.py:24-67) whose edge over a per-frame
  * regressor is sequence memory — each timestep sees a hidden state
  * summarizing the PAST of the trajectory. A gradient-boosted tree gets no
  * such state, but the state's useful content is relational: recent closing
  * rates, smoothed speed/heading, short-horizon deviation. Materializing
  * those as window columns over the canonical trajectory ordering
  * ([[Kinematics.trajWindow]]) hands the GBT the same history the LSTM
  * distills, at the cost of two WindowExecs that share one sort.
  *
  * Every feature is STRICTLY past-only (lag/rolling frames end at the
  * current row): the label looks one frame ahead
  * (`converge_rate = dist[t] − dist[t+1]`, [[Labels.addConvergeRate]]), so
  * nothing here can leak it — the same causality a unidirectional LSTM has.
  * Nulls at trajectory heads are coalesced to the current value (EWMAs) or
  * 0.0 (rates), mirroring the reference's fillna(0) convention
  * (reference: preprocess.py:123-127).
  *
  * Scale shape: both windows partition by the trajectory keys and order by
  * frame_id — the exact exchange/sort every other kinematic feature already
  * pays, so Catalyst reuses the partitioning; no new shuffle at 100 TB.
  */
object SequenceFeatures {

  /** Feature columns [[add]] appends, for feeding straight into
    * [[GbtModel.train]] alongside the per-frame set. */
  val cols: Seq[String] = Seq(
    "closing_rate_lag", "closing_rate_lag2", "closing_ewma",
    "closing_roll_mean", "closing_roll_dev",
    "speed_ewma", "dir_change_roll", "sep_closing_lag", "time_x_closing")

  /** Append the sequence-feature columns. `df` needs the trajectory keys,
    * `frame_id`, `distCol`, `s`, `dir_change`, `time_since_start`, and (if
    * present) `sepCol` — i.e. any frame that went through [[Kinematics]].
    */
  def add(df: DataFrame, distCol: String = "dist_to_ball",
      sepCol: String = "defender_separation"): DataFrame = {
    val w = Kinematics.trajWindow
    // Pass 1 — lagged closing rates (yd/frame, positive = closing on the
    // ball): the one-frame-back finite difference of dist_to_ball, the
    // direct past analogue of the label's one-frame-forward difference.
    val sepClosing =
      if (df.columns.contains(sepCol))
        coalesce(lag(sepCol, 1).over(w) - col(sepCol), lit(0.0))
      else lit(0.0)
    val pass1 = df
      .withColumn("closing_rate_lag",
        coalesce(lag(distCol, 1).over(w) - col(distCol), lit(0.0)))
      .withColumn("closing_rate_lag2",
        coalesce(lag(distCol, 2).over(w) - lag(distCol, 1).over(w), lit(0.0)))
      .withColumn("sep_closing_lag", sepClosing)

    // Pass 2 — smoothers over pass-1 columns (windows can't nest). Same
    // partitioning + ordering → Catalyst sorts once for both WindowExecs.
    // EWMA is the bounded-depth weighted-lag form (α = 0.6, 4 taps): exact
    // enough at 10 Hz, stays inside whole-stage codegen, and needs no
    // recursive fold. Missing taps at the head fall back to the current
    // value so the weights always sum to 1.
    val a1 = 0.6; val a2 = a1 * a1; val a3 = a2 * a1
    val norm = 1.0 + a1 + a2 + a3
    def ewma(c: String): org.apache.spark.sql.Column =
      (col(c) +
        coalesce(lag(c, 1).over(w), col(c)) * a1 +
        coalesce(lag(c, 2).over(w), col(c)) * a2 +
        coalesce(lag(c, 3).over(w), col(c)) * a3) / norm
    val recent = w.rowsBetween(-4, 0)
    pass1
      .withColumn("closing_ewma", ewma("closing_rate_lag"))
      .withColumn("closing_roll_mean", avg("closing_rate_lag").over(recent))
      // population stddev of the recent closing rates: the short-horizon
      // deviation signal (0 for the single-row head frame, not null)
      .withColumn("closing_roll_dev",
        coalesce(stddev_pop("closing_rate_lag").over(recent), lit(0.0)))
      .withColumn("speed_ewma", ewma("s"))
      .withColumn("dir_change_roll", avg("dir_change").over(recent))
      .withColumn("time_x_closing", col("time_since_start") * col("closing_rate_lag"))
  }
}
