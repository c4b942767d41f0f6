package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (pandas `merge_asof` / DuckDB `ASOF JOIN` semantics):
  * for each left row, attach the payload of the right row with the greatest
  * `rightTime <= leftTime` within the same key group — "the most recent quote
  * at or before this trade".
  *
  * Spark has no as-of join operator; the naive encodings are both scale-wrong:
  *   - a range theta-join (`l.t >= r.t`) explodes to O(|L|·|R|) per key before
  *     the per-row argmax prunes it back down;
  *   - a windowed self-join (`join` then `row_number`) shuffles the joined
  *     blow-up, not the inputs.
  *
  * This implementation is the union-tag form: tag both sides, union them, and
  * run ONE window over (key, time, side) taking `last(payload, ignoreNulls)` —
  * each left row picks up the latest right payload seen at-or-before its
  * timestamp. Cost is a single hash exchange on the key plus an in-partition
  * sort of |L|+|R| rows — identical to the shuffle a sort-merge equi-join of
  * the two inputs would pay, with zero intermediate blow-up. At 100 TB this is
  * the only shape that survives: the exchange partitions by key only, so skewed
  * keys can be salted upstream, and AQE can coalesce the post-union partitions.
  *
  * Right-side rows must be unique per (keys, rightTime): the window's
  * tie-break among equal timestamps is otherwise arbitrary. Pre-aggregate the
  * right side (the query layer does) — this mirrors DuckDB's ASOF JOIN, which
  * is nondeterministic under right-side timestamp ties too.
  */
object AsofJoin {

  private val T = "__asof_t"
  private val SIDE = "__asof_side" // 0 = right (quote), 1 = left (probe)

  /** Left as-of join: every left row survives; unmatched rows carry null
    * payloads. Output = all left columns, then `payload` columns, then
    * `matchedTimeCol` (the right timestamp that matched, null if none).
    *
    * @param tolerance max allowed `leftTime - rightTime` (same unit as the
    *                  time columns); matches farther back are nulled out.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      matchedTimeCol: String = "matched_time",
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(!payload.exists(left.columns.contains),
      s"payload columns ${payload.filter(left.columns.contains).mkString(",")} " +
        "collide with left columns — alias one side first")
    val leftCols =
      left.columns.filterNot(c => keys.contains(c) || c == leftTime).toSeq

    // Shared union schema: keys ++ T ++ left-only cols ++ payload cols ++ SIDE.
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).cast("long").as(T)) ++
        leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)) ++
        Seq(lit(1).as(SIDE)): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast("long").as(T)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col) ++
        Seq(lit(0).as(SIDE)): _*)

    // At equal timestamps the right row sorts first (SIDE 0 < 1), making the
    // match inclusive (rightTime <= leftTime), like DuckDB's `ON l.t >= r.t`.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(T), col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn(matchedTimeCol,
        last(when(col(SIDE) === 0, col(T)), ignoreNulls = true).over(w))
      .withColumns(payload.map(p =>
        p -> last(when(col(SIDE) === 0, col(p)), ignoreNulls = true).over(w)).toMap)
      .filter(col(SIDE) === 1)

    val gapOk: Column = tolerance match {
      case Some(tol) => col(T) - col(matchedTimeCol) <= tol
      case None => lit(true)
    }
    matched.select(
      keys.map(col) ++
        Seq(col(T).as(leftTime)) ++
        leftCols.map(col) ++
        payload.map(p => when(gapOk, col(p)).as(p)) ++
        Seq(when(gapOk, col(matchedTimeCol)).as(matchedTimeCol)): _*)
  }
}
