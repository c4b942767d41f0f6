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
  * the exchange partitions by key only; when ONE key is hot enough that its
  * single-task sort bottlenecks, use [[backwardSalted]], which splits each
  * key's time range across tasks and carries the reigning quote over the
  * split boundaries. AQE can coalesce the post-union partitions.
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
  private val B = "__asof_b" // time-range bucket (salted variant only)
  private val MN = "__asof_mn" // global span min (salted variant only)
  private val MX = "__asof_mx" // global span max (salted variant only)

  private def requireSane(left: DataFrame, right: DataFrame, keys: Seq[String],
      payload: Seq[String], matchedTimeCol: String): Unit = {
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
    val reserved = Seq(T, SIDE, Q, B, MN, MX)
    val reservedHits =
      (left.columns ++ right.columns ++ outNames).filter(reserved.contains)
    require(reservedHits.isEmpty,
      s"columns ${reservedHits.distinct.mkString(",")} use reserved __asof_* " +
        "names — rename first")
  }

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
    requireSane(left, right, keys, payload, matchedTimeCol)
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

  /** Skew-hardened [[backward]]: identical semantics, but the window
    * partitions on (keys, time-range bucket) instead of keys alone, so one
    * HOT key's |L|+|R| in-partition sort spreads over up to `nSplits` tasks
    * instead of serializing in one ([[backward]]'s scaladoc said "salt
    * upstream"; this is that salt, built in).
    *
    * Mechanics: bucket boundaries come from the GLOBAL time span (one tiny
    * broadcast agg — a hot key spanning the range splits evenly; a key
    * narrower than one bucket stays single-task, but then it wasn't hot in
    * the sorted-window sense). The reigning quote crosses bucket boundaries
    * the same way [[graft.streaming.StreamingAsof]] carries its dominating
    * quote: each (key, bucket)'s latest quote (`max_by` — one map-side-
    * combinable agg) is replicated into every later bucket with its ORIGINAL
    * timestamp, so tolerance gaps and matched times stay exact, and the
    * in-bucket window picks the latest at-or-before each probe as usual.
    *
    * Cost vs [[backward]]: one extra pass to measure the span, a small
    * right-side agg + explode (≤ |keys|·nSplits²/2 carried rows), and the
    * main exchange keys on (keys, bucket). Buy it when [[Skew.hotKeys]] says
    * one key dominates; stay with [[backward]] otherwise.
    */
  def backwardSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      matchedTimeCol: String = "matched_time",
      tolerance: Option[Long] = None,
      nSplits: Int = 8): DataFrame = {
    require(nSplits >= 1, s"nSplits must be >= 1, got $nSplits")
    requireSane(left, right, keys, payload, matchedTimeCol)
    val leftOnly = left.columns.filterNot(keys.contains).toSeq

    val qStruct = struct(
      (orderKey(right, rightTime).as(T) +: payload.map(col)): _*)
    val qType = right.select(qStruct).schema.head.dataType
    val l = left.select(
      keys.map(col) ++
        Seq(orderKey(left, leftTime).as(T)) ++
        leftOnly.map(col) ++
        Seq(lit(null).cast(qType).as(Q), lit(1).as(SIDE)): _*)
    val r = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++
        Seq(orderKey(right, rightTime).as(T)) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(qStruct.as(Q), lit(0).as(SIDE)): _*)

    // Global span → bucket of a time value. Doubles are exact enough here
    // (µs epochs ≈ 1.7e15 < 2^53); a NULL left time gets a NULL bucket and
    // forms its own quote-free partition — null payload, same as backward.
    val span = l.select(col(T)).unionByName(r.select(col(T)))
      .agg(min(col(T)).cast("double").as(MN), max(col(T)).cast("double").as(MX))
    def bucketOf(t: Column): Column =
      when(col(MX) === col(MN), lit(0)).otherwise(
        least(floor((t.cast("double") - col(MN)) /
          (col(MX) - col(MN)) * nSplits).cast("int"), lit(nSplits - 1)))
    val lb = l.crossJoin(broadcast(span))
      .withColumn(B, bucketOf(col(T))).drop(MN, MX)
    val rb = r.crossJoin(broadcast(span))
      .withColumn(B, bucketOf(col(T))).drop(MN, MX)

    // Closing quote of each (key, bucket), replicated into every LATER
    // bucket. Replication beats a per-key bucket-spine join: no distinct
    // over the union, and the window's last() picks the latest carry anyway.
    // (The B < nSplits-1 filter also keeps sequence() ascending.)
    val carryRows = rb
      .groupBy((keys :+ B).map(col): _*).agg(max_by(col(Q), col(T)).as(Q))
      .filter(col(B) < nSplits - 1)
      .withColumn(B, explode(sequence(col(B) + 1, lit(nSplits - 1))))
      .select(
        keys.map(col) ++
          Seq(col(Q).getField(T).as(T)) ++
          leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(col(Q).as(Q), lit(0).as(SIDE), col(B)): _*)

    // A carried quote's T maps to an EARLIER bucket, so it sorts strictly
    // before every native row of the bucket it is carried into — it can
    // only win when the bucket has no earlier native quote.
    val w = Window.partitionBy((keys :+ B).map(col): _*)
      .orderBy(col(T), col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lb.unionByName(rb).unionByName(carryRows)
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
