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

  /** What [[estimateEquiJoinSize]] measured per side and concluded. */
  final case class JoinSizeEstimate(
      rowsLeft: Long, rowsRight: Long,
      distinctLeft: Double, distinctRight: Double,
      keyOverlap: Double, estimatedRows: Double)

  /** **Join-size preflight**: estimate |L ⋈ R| on an equi-key WITHOUT
    * running the join, from one cheap aggregation pass per side — the
    * routing input for "broadcast or shuffle?", "how many shuffle
    * partitions?", and "is this join worth running at all?" decisions that
    * at 100 TB must be made before paying for the join, not after.
    *
    * Per side: total rows + a [[ThetaSketch]] of the key domain (KB-scale,
    * map-side partial merge like any agg). The theta retained samples give
    * the key-domain OVERLAP — the quantity HLL cannot answer — and
    * rows/distinct gives each side's mean key multiplicity, so
    *
    *   |L ⋈ R| ≈ overlap × (rowsL / distinctL) × (rowsR / distinctR)
    *
    * Exact under per-key-uniform multiplicities (e.g. FK joins where every
    * key matches ~equally often); a heavily skewed side makes this an
    * UNDERestimate (E[aᵢ·bᵢ] ≥ E[a]·E[b] for positively correlated
    * multiplicities) — treat the answer as a floor when skew is known, or
    * check [[Skew.hotKeys]] first. Error on the overlap itself is the
    * sketch's RSE ≈ 1/√(k−1). NULL keys never join and are excluded
    * ([[ThetaSketch.hashCol]] semantics).
    */
  def estimateEquiJoinSize(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): JoinSizeEstimate =
    estimateEquiJoinSize(left, right, Seq(leftKey), Seq(rightKey))

  def estimateEquiJoinSize(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, k: Int): JoinSizeEstimate =
    estimateEquiJoinSize(left, right, Seq(leftKey), Seq(rightKey), k)

  /** Multi-key form: positions pair up (`leftKeys(i)` joins `rightKeys(i)`),
    * the composite key is hashed as a tuple, and — SQL join semantics — a
    * row with ANY null key component never joins and is excluded. */
  def estimateEquiJoinSize(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      k: Int = ThetaSketch.DefaultK): JoinSizeEstimate = {
    import org.apache.spark.sql.functions.{count, lit, col, when, xxhash64}
    import org.apache.spark.sql.types._
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"estimateEquiJoinSize: key lists must pair up, got $leftKeys / $rightKeys")
    // xxhash64 hashes VALUES THROUGH THEIR TYPE (a 4-byte int and an
    // 8-byte long holding the same number hash differently), so mixed-type
    // keys — the common int-FK-vs-long-PK case, which the real join
    // happily coerces and matches — would estimate overlap ~0. Normalize
    // each position to one type; refuse combinations the join itself
    // would only match through lossy coercion.
    def integral(t: DataType): Boolean =
      t == ByteType || t == ShortType || t == IntegerType || t == LongType
    val commons: Seq[Option[String]] =
      leftKeys.zip(rightKeys).map { case (lk, rk) =>
        val lt = left.schema(lk).dataType
        val rt = right.schema(rk).dataType
        if (lt == rt) None
        else if (integral(lt) && integral(rt)) Some("long")
        else if (lt.isInstanceOf[NumericType] && rt.isInstanceOf[NumericType])
          Some("double") // doubles above 2^53 can collide; fine for an estimate
        else throw new IllegalArgumentException(
          s"estimateEquiJoinSize: key types ${lt.simpleString} vs " +
            s"${rt.simpleString} at position ($lk, $rk) have no hash-stable " +
            "common form — cast the keys to one type first")
      }
    def side(df: DataFrame, keys: Seq[String]): (Long, Long, ThetaSketch) = {
      val kcs = keys.zip(commons).map { case (kc, c) =>
        c.map(col(kc).cast).getOrElse(col(kc))
      }
      val allSet = keys.map(col(_).isNotNull).reduce(_ && _)
      val r = df.agg(count(lit(1)).as("n"),
        count(when(allSet, lit(1))).as("nk"),
        ThetaSketch.thetaAggK(k)(when(allSet, xxhash64(kcs: _*))).as("sk"))
        .head()
      (r.getAs[Long]("n"), r.getAs[Long]("nk"),
        ThetaSketch.deserialize(r.getAs[Array[Byte]]("sk")))
    }
    // the two sides are independent full scans — overlap them instead of
    // paying scanL + scanR sequentially for a "cheap" preflight
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fL = Future(side(left, leftKeys))
    val fR = Future(side(right, rightKeys))
    val (nL, nkL, skL) = Await.result(fL, Duration.Inf)
    val (nR, nkR, skR) = Await.result(fR, Duration.Inf)
    val dL = skL.estimate
    val dR = skR.estimate
    val overlap = ThetaSketch.intersectEstimate(skL, skR)
    // multiplicities over NON-NULL key rows only (null rows never join)
    val est =
      if (dL == 0.0 || dR == 0.0) 0.0
      else overlap * (nkL / dL) * (nkR / dR)
    JoinSizeEstimate(nL, nR, dL, dR, overlap, est)
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
