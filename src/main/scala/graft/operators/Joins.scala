package graft.operators

import org.apache.spark.sql.DataFrame

/** Join helpers (SURVEY §2.3 J9) and composed operators Spark lacks natively. */
object Joins {

  /** **As-of join** (pandas `merge_asof` semantics, backward direction): for
    * each left row, attach ALL value columns of the most recent right row
    * with `rightTime <= leftTime` within the same key group. Convenience
    * form of [[AsofJoin.backward]] (which adds tolerance and the matched
    * timestamp) — see there for the union-tag plan shape and its cost.
    *
    * Right value columns must not collide with left columns (rename first).
    * Ties (`rightTime == leftTime`): the right row wins (<=, backward join).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val valueCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    require(valueCols.nonEmpty, "right side carries no value columns")
    // internal matched-time name chosen to not collide with either input
    val mt = LazyList.from(0).map(i => s"__asof_matched_t$i")
      .filterNot(n => left.columns.contains(n) || valueCols.contains(n)).head
    AsofJoin.backward(left, right, keys, leftTime, rightTime, valueCols.toSeq,
        matchedTimeCol = mt)
      .drop(mt)
  }

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
