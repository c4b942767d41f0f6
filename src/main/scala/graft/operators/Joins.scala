package graft.operators

import org.apache.spark.sql.DataFrame

/** Join helpers (SURVEY §2.3 J9). */
object Joins {

  /** J9 — join on the intersection of available key columns, resolved at
    * plan-build time (reference: bdb2026/preprocess.py:244-248 merges on
    * whichever of (game_id, play_id, nfl_id, frame_id) both frames carry).
    */
  def onCommonKeys(left: DataFrame, right: DataFrame,
      candidateKeys: Seq[String], joinType: String = "inner"): DataFrame = {
    val keys = candidateKeys.filter(k =>
      left.columns.contains(k) && right.columns.contains(k))
    require(keys.nonEmpty,
      s"no common keys among ${candidateKeys.mkString(",")}; " +
        s"left=${left.columns.mkString(",")} right=${right.columns.mkString(",")}")
    left.join(right, keys, joinType)
  }
}
