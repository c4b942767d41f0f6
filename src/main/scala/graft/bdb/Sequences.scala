package graft.bdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Padded fixed-length sequence assembly for sequence models (SURVEY §2.5 W10;
  * reference: bdb2026/sequences.py:21-88 builds dense (N, 25, F) NumPy tensors).
  *
  * Kept relational: one row per trajectory with
  * `seq: array<array<double>>` (length exactly `maxLen`, zero-padded at the
  * tail, truncated to the *last* maxLen frames) plus the true length and a
  * parallel mask. Downstream consumers (export for an external trainer, or the
  * MLlib per-frame model in [[Model]]) read it without leaving Spark — no
  * driver-side collect, so it scales with the cluster.
  */
object Sequences {

  /** @param frames   ordered-frame table with the feature columns present
    * @param features per-frame feature column names (F)
    * @param maxLen   pad/truncate length (reference: max_len=25)
    */
  def build(frames: DataFrame, features: Seq[String], maxLen: Int = 25): DataFrame = {
    val featArr = array(features.map(col(_).cast("double")): _*)
    val collected = frames
      .groupBy(Schemas.trajectoryKeys.map(col): _*)
      .agg(collect_list(struct(col("frame_id"), featArr.as("f"))).as("raw"))
      // collect_list order is nondeterministic across partitions → sort by
      // frame_id inside the array (deterministic, no extra shuffle).
      .withColumn("sorted", expr("transform(array_sort(raw), x -> x.f)"))
      .drop("raw")
    val f = features.size
    collected
      .withColumn("seq_len", least(size(col("sorted")), lit(maxLen)))
      // keep the LAST maxLen frames (reference: sequences.py tail-keep), then
      // zero-pad the tail up to maxLen.
      .withColumn("kept", expr(s"slice(sorted, greatest(size(sorted) - $maxLen + 1, 1), $maxLen)"))
      // NB: Spark sequence(1, 0) counts DOWN ([1,0]) — guard the full case.
      .withColumn("pad", expr(
        s"""CASE WHEN size(kept) >= $maxLen THEN slice(kept, 1, 0)
           |ELSE transform(sequence(1, $maxLen - size(kept)), i -> array_repeat(0.0d, $f))
           |END""".stripMargin))
      .withColumn("seq", concat(col("kept"), col("pad")))
      .withColumn("mask", expr(
        s"transform(sequence(1, $maxLen), i -> CASE WHEN i <= size(kept) THEN 1.0d ELSE 0.0d END)"))
      .select(Schemas.trajectoryKeys.map(col) ++
        Seq(col("seq_len"), col("seq"), col("mask")): _*)
  }
}
