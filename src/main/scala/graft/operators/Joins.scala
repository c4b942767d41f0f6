package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}

/** Join helpers (SURVEY §2.3 J9) and composed operators Spark lacks natively. */
object Joins {

  /** **As-of join** (pandas `merge_asof` semantics, backward direction): for
    * each left row, attach the most recent right row with
    * `rightTime <= leftTime` within the same key group.
    *
    * Spark has no native as-of join; per the survey's preference order this is
    * path (a) — composition of built-ins: tag both sides, UNION them, one
    * window sort per key group with `last(_, ignoreNulls)` carry-forward, then
    * keep the left rows. Cost: a single hash exchange + sort on
    * (keys, time) — the same price as one sort-merge join, with no range
    * explosion and no skew beyond the key distribution itself (AQE handles
    * that). This is the 100 TB-safe shape; a per-key `mapPartitions` merge
    * would need the same shuffle anyway.
    *
    * Right value columns must not collide with left columns (rename first).
    * Ties (`rightTime == leftTime`): the right row wins (<=, backward join).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val valueCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    require(valueCols.nonEmpty, "right side carries no value columns")
    val collide = valueCols.filter(left.columns.contains)
    require(collide.isEmpty, s"rename right columns before asOfJoin: ${collide.mkString(",")}")

    val leftTagged = left.withColumn("__t", orderKey(left, leftTime))
      .withColumn("__is_left", lit(1))
    val rightTagged = right.withColumn("__t", orderKey(right, rightTime))
      .withColumn("__is_left", lit(0))
    val unioned = leftTagged.unionByName(
      rightTagged.drop(rightTime), allowMissingColumns = true)

    // Order within key by (time, right-before-left) so a right row at the
    // exact left timestamp is visible to that left row.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_left") === 1)
      .drop("__t", "__is_left")
  }

  /** Order-preserving sort key for the as-of union. Timestamps become
    * microsecond longs (`cast("long")` would truncate to whole seconds and
    * silently attach right rows up to 999 ms in the future); numerics pass
    * through untouched so long keys keep full precision. */
  private def orderKey(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case DateType => unix_date(col(c)).cast("long")
      case _: NumericType => col(c)
      case dt => throw new IllegalArgumentException(
        s"asOfJoin time column $c has unsupported type $dt")
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
