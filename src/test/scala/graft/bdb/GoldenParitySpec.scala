package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity against the reference's COMMITTED golden artifacts (SURVEY §5.4):
  * the predictions CSV carries (actual, predicted, residual) for 53,785
  * frames; our metric definitions must reproduce the reference's published
  * acceptance numbers (BDB_2026.ipynb cell 102: MSE 0.0059, RMSE 0.0768,
  * MAE 0.0517, R² 0.9466) from it, and our residual convention must match
  * theirs. This is the strongest ML-free evidence that the engine's metric
  * semantics equal the reference's.
  */
class GoldenParitySpec extends SparkSpec {

  private val predPath =
    "/root/reference/outputs/postthrow_predictions_BlindPhysics_Completed_Pass.csv"

  private lazy val preds = spark.read
    .schema(StructType(Seq(
      StructField("game_id", LongType), StructField("play_id", LongType),
      StructField("frame_id", LongType),
      StructField("actual_converge_rate", DoubleType),
      StructField("predicted_converge_rate", DoubleType),
      StructField("residual", DoubleType))))
    .option("header", "true").csv(predPath)
    .cache()

  test("residual convention matches: residual == actual - predicted") {
    // tolerance 1e-6: the reference's predicted values are float32 model
    // outputs serialized at 8 significant digits — the committed residual was
    // computed from the pre-serialization float32, so re-parsed doubles
    // differ in the ~1e-9 range; anything larger would mean a different
    // residual convention (e.g. predicted - actual).
    val mismatches = preds.filter(
      abs(col("residual") -
        (col("actual_converge_rate") - col("predicted_converge_rate"))) > 1e-6)
      .count()
    assert(mismatches === 0)
    assert(preds.count() === 53785)
  }

  test("regressionMetrics reproduces the published acceptance numbers") {
    val m = ModelEval.regressionMetrics(preds,
      actual = "actual_converge_rate", pred = "predicted_converge_rate").head()
    // cell 102: MSE 0.0059, RMSE 0.0768, MAE 0.0517, R² 0.9466 (rounded)
    assert(math.abs(m.getAs[Double]("mse") - 0.0059) < 5e-4,
      s"mse=${m.getAs[Double]("mse")}")
    assert(math.abs(m.getAs[Double]("rmse") - 0.0768) < 5e-3,
      s"rmse=${m.getAs[Double]("rmse")}")
    assert(math.abs(m.getAs[Double]("mae") - 0.0517) < 5e-3,
      s"mae=${m.getAs[Double]("mae")}")
    assert(math.abs(m.getAs[Double]("r2") - 0.9466) < 5e-3,
      s"r2=${m.getAs[Double]("r2")}")
  }

  test("per-play TrueSpeed rollup runs on the reference's own predictions") {
    // the committed CSV has no nfl_id (targeted receiver implied) — roll up
    // per play, as metrics.py:13-57 does before the player join
    val perPlay = Metrics.trueSpeedPerPlay(
      preds.withColumn("nfl_id", lit(0L)))
    assert(perPlay.count() === preds.select("game_id", "play_id").distinct().count())
    val stats = perPlay.agg(
      avg("residual_mean").as("grand_mean"),
      min("n_frames").as("min_f"), max("n_frames").as("max_f")).head()
    // residuals of a fitted model: grand mean near zero (SURVEY §5 invariant)
    assert(math.abs(stats.getAs[Double]("grand_mean")) < 0.05)
    assert(stats.getAs[Long]("min_f") >= 1L)
  }

  test("routeExecIQ reproduces the committed RouteExecIQ column exactly") {
    val golden = spark.read.option("header", "true").option("inferSchema", "true")
      .csv("/root/reference/outputs/RouteExecIQ.csv")
      .select(col("game_id"), col("play_id"), col("nfl_id"),
        col("route_cluster"), col("route_deviation"),
        col("RouteExecIQ").cast("double").as("golden_iq"))
    val recomputed = Routes.routeExecIQ(golden)
    val worst = recomputed
      .agg(max(abs(col("route_exec_iq") - col("golden_iq")))).head().getDouble(0)
    assert(worst < 1e-9, s"max |recomputed - golden| = $worst")
    assert(recomputed.count() === 8202)
  }

  test("in-engine forward pass over the committed weights lands inside the " +
    "committed predictions' envelope") {
    // The reference never published the per-frame model INPUTS, so bit-exact
    // reproduction of this CSV is not derivable from public artifacts (the
    // forward-pass math itself is pinned by KerasLstmSpec's independent
    // cross-implementation fixture). What IS checkable end-to-end: the
    // committed predictions came from THIS weight file, so the engine's
    // forward pass on inputs spanning the notebook's feature magnitudes
    // (BDB_2026.ipynb cell 64 sample: positions ~tens, unit-scale trig)
    // must produce values inside the CSV's observed output envelope —
    // a transposed kernel, wrong gate order, or byte-order bug in the
    // weight path blows outputs far outside it.
    val m = graft.ml.KerasLstm.load(
      "/root/reference/models/convergence_lstm_model_BlindPhysics_Completed_Pass.h5")
    val env = preds.agg(
      min("predicted_converge_rate").as("lo"),
      max("predicted_converge_rate").as("hi")).head()
    val (lo, hi) = (env.getAs[Double]("lo"), env.getAs[Double]("hi"))
    val rnd = new scala.util.Random(7)
    val outputs = (0 until 50).flatMap { _ =>
      val t = 5 + rnd.nextInt(20)
      val seq = Array.fill(t) {
        val x = new Array[Float](m.nFeatures)
        x(0) = 30f + rnd.nextFloat() * 60f // x_norm
        x(1) = rnd.nextFloat() * 53f // y_norm
        (2 to 4).foreach(k => x(k) = rnd.nextFloat() * 8f - 4f) // dx dy speed
        x(5) = rnd.nextFloat() * 20f // dist_to_land
        (6 to 9).foreach(k => x(k) = rnd.nextFloat() * 2f - 1f)
        (10 to 12).foreach(k => x(k) = rnd.nextFloat() * 30f)
        (13 until m.nFeatures).foreach(k => x(k) = rnd.nextFloat() * 10f)
        x
      }
      m.forward(seq)
    }
    // generous slack: random inputs are off-manifold; an envelope breach of
    // 3x the committed output span means broken weights, not odd inputs
    val span = hi - lo
    assert(outputs.forall(v => v > lo - 3 * span && v < hi + 3 * span),
      s"forward outputs [${outputs.min}, ${outputs.max}] vs committed [$lo, $hi]")
    // and they are not degenerate (all-saturated or constant)
    assert(outputs.distinct.size > 100)
  }

  test("defender-separation golden table loads and respects its fill bounds") {
    val sep = spark.read
      .schema(StructType(Seq(
        StructField("game_id", LongType), StructField("play_id", LongType),
        StructField("frame_id", LongType),
        StructField("defender_separation", DoubleType))))
      .option("header", "true")
      .csv("/root/reference/outputs/df_postthrow_defender_sep.csv")
    assert(sep.count() === 104080)
    val bad = sep.filter(col("defender_separation") < 0.0 ||
      col("defender_separation").isNull).count()
    assert(bad === 0)
  }
}
