package graft.bdb

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.{StandardScaler, StandardScalerModel, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Route feature engineering + clustering (SURVEY §7 step 6).
  *
  * The reference computes per-route features with an 85-line Python loop
  * (reference: BDB_2026.ipynb cell 27) or vectorized pandas (routes.py:72-155);
  * here it is one `groupBy.agg` — a single partial→final hash-agg shuffle on
  * the trajectory key. First/last-by-frame use `min_by`/`max_by`, which are
  * order-insensitive (no sort needed, unlike the pandas sort+first idiom).
  *
  * Clustering is MLlib StandardScaler + KMeans(k=12, seed=42)
  * (reference: routes.py:213-217). sklearn and MLlib initialization differ, so
  * cluster *labels* are not bit-comparable; correctness is asserted on
  * invariants (assignment = nearest centroid, k clusters, downstream-metric
  * stability) per SURVEY §5.
  */
object Routes {

  /** Default clustering features — the reference's candidate list
    * (routes.py:185-189) minus the optional sep_at_catch (added by callers
    * that computed it). */
  val featureCols: Seq[String] = Seq(
    "route_frames", "delta_x", "delta_y", "route_len", "direct_dist",
    "straightness", "mean_speed", "max_speed", "std_speed")

  /** Per-trajectory route features from normalized + kinematic frames —
    * the reference's full 19-column table with identical names and semantics
    * (routes.py:74-155): first/last via order-free min_by/max_by, route_len
    * from lag-diff step distances, straightness with the 0-length guard,
    * sample-std speeds with single-frame fillna(0), wrap-aware direction
    * changes (> 30°), duration = n_frames × 0.1.
    * Expects x_norm/y_norm/s/a/dir_change columns (see Normalize/Kinematics).
    */
  def routeFeatures(frames: DataFrame): DataFrame = {
    val stepDist = Kinematics.dist(
      col("x_norm"), col("y_norm"),
      lag("x_norm", 1).over(Kinematics.trajWindow),
      lag("y_norm", 1).over(Kinematics.trajWindow))
    val dx = col("x_end") - col("x_start")
    val dy = col("y_end") - col("y_start")
    frames
      .withColumn("step_dist", coalesce(stepDist, lit(0.0)))
      .groupBy(Schemas.trajectoryKeys.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("route_frames"),
        min_by(col("x_norm"), col("frame_id")).as("x_start"),
        min_by(col("y_norm"), col("frame_id")).as("y_start"),
        max_by(col("x_norm"), col("frame_id")).as("x_end"),
        max_by(col("y_norm"), col("frame_id")).as("y_end"),
        sum(col("step_dist")).as("route_len"),
        avg(col("s")).as("mean_speed"),
        max(col("s")).as("max_speed"),
        coalesce(stddev_samp(col("s")), lit(0.0)).as("std_speed"),
        avg(col("a")).as("mean_accel"),
        max(col("a")).as("max_accel"),
        sum((col("dir_change") > 30.0).cast("int")).cast("double")
          .as("direction_changes"),
        (max(col("y_norm")) - min(col("y_norm"))).as("lateral_range"))
      .withColumn("delta_x", dx)
      .withColumn("delta_y", dy)
      .withColumn("delta_y_abs", abs(dy))
      .withColumn("direct_dist", sqrt(dx * dx + dy * dy))
      .withColumn("straightness",
        when(col("route_len") === 0.0, 0.0)
          .otherwise(col("direct_dist") / col("route_len")))
      .withColumn("route_duration", col("route_frames") * Kinematics.FrameDt)
  }

  final case class RouteClustering(
      scaler: StandardScalerModel,
      kmeans: KMeansModel,
      assigned: DataFrame)

  /** Median-impute → standardize → KMeans(k, seed). Adds `route_cluster`.
    * (reference: routes.py:173-233; imputation :202-205 via percentile_approx.)
    */
  def clusterRoutes(features: DataFrame, k: Int = 12, seed: Long = 42L): RouteClustering = {
    // median imputation without a separate Imputer pass: one global agg, then coalesce
    val medians = featureCols.map(c =>
      percentile_approx(col(c), lit(0.5), lit(10000)).as(s"med_$c"))
    val medRow = features.agg(medians.head, medians.tail: _*)
    val imputed = features.crossJoin(broadcast(medRow))
    val filled = featureCols.foldLeft(imputed) { (df, c) =>
      df.withColumn(c, coalesce(col(c), col(s"med_$c")))
    }.drop(featureCols.map(c => s"med_$c"): _*)

    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features_raw")
      .transform(filled)
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
      .fit(assembled)
    val scaled = scaler.transform(assembled)
    val km = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("route_cluster")
      .fit(scaled)
    RouteClustering(scaler, km, km.transform(scaled))
  }

  /** M4 — 2-component PCA of the scaled feature vectors (reference:
    * BDB_2026.ipynb cell 39; visualization aid, exposed for parity). Expects
    * the `features` vector column from [[clusterRoutes]]'s scaler. */
  def pca2(scaled: DataFrame): DataFrame =
    new org.apache.spark.ml.feature.PCA()
      .setInputCol("features").setOutputCol("pca_features").setK(2)
      .fit(scaled).transform(scaled)

  /** One-hot embedding table route_emb_0..k-1 (reference: routes.py:284-295). */
  def oneHotEmbeddings(assigned: DataFrame, k: Int = 12): DataFrame =
    (0 until k).foldLeft(assigned) { (df, i) =>
      df.withColumn(s"route_emb_$i",
        when(col("route_cluster") === i, 1.0).otherwise(0.0))
    }

  /** Per-cluster centroids in *feature space* as a small DataFrame — broadcast
    * side of the deviation join (reference: Phase3 cell 10 recomputes means;
    * equivalently KMeansModel.clusterCenters unscaled).
    */
  def clusterCentroids(assigned: DataFrame): DataFrame =
    assigned.groupBy("route_cluster")
      .agg(avg(col(featureCols.head)).as(s"cent_${featureCols.head}"),
        featureCols.tail.map(c => avg(col(c)).as(s"cent_$c")): _*)

  /** Euclidean deviation of each route from its cluster centroid
    * (reference: Phase3 cell 12 apply-per-row → broadcast join + expression;
    * metrics.py:170-182). No UDF: codegen'd sqrt-of-sums.
    */
  def routeDeviation(assigned: DataFrame): DataFrame = {
    val sq = featureCols.map(c =>
      (col(c) - col(s"cent_$c")) * (col(c) - col(s"cent_$c"))).reduce(_ + _)
    assigned.join(broadcast(clusterCentroids(assigned)), Seq("route_cluster"))
      .withColumn("route_deviation", sqrt(sq))
      .drop(featureCols.map(c => s"cent_$c"): _*)
  }

  /** RouteExecIQ: negated within-cluster z-score of deviation — lower
    * deviation = better execution.
    *
    * Defaults (sample stddev, no clipping) reproduce the reference's
    * COMMITTED artifact exactly (outputs/RouteExecIQ.csv; Phase3 cell 14 uses
    * pandas' ddof=1 — verified to 4e-15 in GoldenParitySpec). The
    * metrics.py:97-122 variant (ddof=0, clip ±3) is available via
    * `sampleStd = false, clip = Some(3.0)`; the survey's W5 note flags the
    * reference's own inconsistency here — match per metric.
    */
  def routeExecIQ(withDeviation: DataFrame, sampleStd: Boolean = true,
      clip: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy("route_cluster")
    val sd =
      if (sampleStd) stddev_samp("route_deviation").over(wc)
      else stddev_pop("route_deviation").over(wc)
    // degenerate cluster (all deviations equal) → z = 0; ANSI mode would
    // otherwise raise DIVIDE_BY_ZERO.
    val z = when(sd === 0.0 || sd.isNull, lit(0.0)).otherwise(
      (col("route_deviation") - avg("route_deviation").over(wc)) / sd)
    val iq = clip match {
      case Some(c) => greatest(least(-z, lit(c)), lit(-c))
      case None => -z
    }
    withDeviation.withColumn("route_exec_iq", iq)
  }
}
