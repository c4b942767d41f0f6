package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, NumericType, ShortType, TimestampNTZType, TimestampType}

/** Backward as-of join (pandas `merge_asof` / DuckDB `ASOF JOIN` semantics):
  * for each left row, attach the payload of the right row with the greatest
  * `rightTime <= leftTime` within the same key group — "the most recent quote
  * at or before this trade". [[Joins.asOfJoin]] is the thin convenience form
  * of this operator (all right value columns, no tolerance/matched-time).
  *
  * Spark has no as-of join operator; the naive encodings are both scale-wrong:
  *   - a range theta-join (`l.t >= r.t`) explodes to O(|L|·|R|) per key before
  *     the per-row argmax prunes it back down;
  *   - a windowed self-join (`join` then `row_number`) shuffles the joined
  *     blow-up, not the inputs.
  *
  * This implementation is the union-tag form: tag both sides, union them, and
  * run ONE window over (key, time, side) taking the last right ROW seen
  * at-or-before each left timestamp (a single struct-valued `last(...,
  * ignoreNulls)` — per-column lasts would splice values from DIFFERENT right
  * rows whenever a payload field is legitimately NULL). Cost is a single hash
  * exchange on the key plus an in-partition sort of |L|+|R| rows — identical
  * to the shuffle a sort-merge equi-join of the two inputs would pay, with
  * zero intermediate blow-up. At 100 TB this is the only shape that survives:
  * the exchange partitions by key only, so skewed keys can be salted
  * upstream, and AQE can coalesce the post-union partitions.
  *
  * Right-side rows must be unique per (keys, rightTime): the window's
  * tie-break among equal timestamps is otherwise arbitrary. Pre-aggregate the
  * right side (the query layer does) — this mirrors DuckDB's ASOF JOIN, which
  * is nondeterministic under right-side timestamp ties too.
  *
  * NULL time semantics (matches DuckDB ASOF and pandas `merge_asof`, which
  * never match NULL times): right rows with a NULL `rightTime` are dropped
  * before the union — left in, they would sort first (NULLS FIRST) and their
  * non-null payload struct would be carried as a phantom match into left
  * rows that have no real preceding quote. Left rows with a NULL `leftTime`
  * are KEPT (it is a left join) but likewise sort ahead of every surviving
  * quote, so they emit null payload / null matched time naturally.
  */
object AsofJoin {

  private val T = "__asof_t"
  private val SIDE = "__asof_side" // 0 = right (quote), 1 = left (probe)
  private val Q = "__asof_q" // struct(right time, right payloads)

  /** Order-preserving form of a time column. Timestamps become microsecond
    * longs (a bare `cast("long")` would truncate to whole seconds and let a
    * sub-second-FUTURE right row match "at-or-before"), dates become epoch
    * days, integrals widen to long, and FRACTIONAL numerics pass through
    * untouched — truncating them would reintroduce the same future-match
    * bug at sub-integer distances. `tolerance` and `matchedTimeCol` are
    * therefore in µs / days / the column's own unit respectively. */
  private[operators] def orderKey(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case DateType => unix_date(col(c)).cast("long")
      case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
      case _: NumericType => col(c) // double/float/decimal: exact order kept
      case dt => throw new IllegalArgumentException(
        s"as-of time column $c has unsupported type $dt")
    }

  /** Left as-of join: every left row survives; unmatched rows carry null
    * payloads. Output = the left columns unchanged (original types and
    * order), then `payload` columns, then `matchedTimeCol` (the matched
    * right timestamp in [[orderKey]] units, null if none).
    *
    * @param tolerance max allowed `leftTime - rightTime` in [[orderKey]]
    *                  units; matches farther back are nulled out.
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
    val outNames = payload :+ matchedTimeCol
    val clashes = outNames.filter(left.columns.contains) ++
      (if (payload.contains(matchedTimeCol)) Seq(matchedTimeCol) else Nil) ++
      payload.diff(payload.distinct)
    require(clashes.isEmpty,
      s"output columns ${clashes.distinct.mkString(",")} collide with left " +
        "columns (or each other) — alias or rename first")
    // The union schema owns these names; inputs (or outputs) reusing them
    // would fail later with an opaque ambiguous-attribute AnalysisException.
    val reserved = Seq(T, SIDE, Q)
    val reservedHits =
      (left.columns ++ right.columns ++ outNames).filter(reserved.contains)
    require(reservedHits.isEmpty,
      s"columns ${reservedHits.distinct.mkString(",")} use reserved __asof_* " +
        "names — rename first")
    val leftOnly = left.columns.filterNot(keys.contains).toSeq

    // Shared union schema: keys ++ T ++ left-only cols ++ Q(right row) ++ SIDE.
    val qStruct = struct(
      (orderKey(right, rightTime).as(T) +: payload.map(col)): _*)
    val qType = right.select(qStruct).schema.head.dataType
    val l = left.select(
      keys.map(col) ++
        Seq(orderKey(left, leftTime).as(T)) ++
        leftOnly.map(col) ++
        Seq(lit(null).cast(qType).as(Q), lit(1).as(SIDE)): _*)
    // NULL-time quotes can never match anything — and would phantom-match
    // (see scaladoc) if left to sort NULLS FIRST with a non-null Q struct.
    val r = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++
        Seq(orderKey(right, rightTime).as(T)) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(qStruct.as(Q), lit(0).as(SIDE)): _*)

    // At equal timestamps the right row sorts first (SIDE 0 < 1), making the
    // match inclusive (rightTime <= leftTime), like DuckDB's `ON l.t >= r.t`.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(T), col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ONE struct-valued last: time and every payload field come from the SAME
    // matched right row (never null for a right row, even if its payload
    // fields are).
    val matched = l.unionByName(r)
      .withColumn(Q, last(col(Q), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)

    val mt = col(Q).getField(T)
    val gapOk: Column = tolerance match {
      case Some(tol) => col(T) - mt <= tol
      case None => lit(true)
    }
    matched.select(
      left.columns.toSeq.map(col) ++
        payload.map(p => when(gapOk, col(Q).getField(p)).as(p)) ++
        Seq(when(gapOk, mt).as(matchedTimeCol)): _*)
  }
}
