package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** **Scale-adaptive nearest-in-group** (SURVEY §2.3 J7; reference: per-frame
  * nearest defender, BDB_2026.ipynb cell 69 / preprocess.py:489-499): for
  * each left row, the minimum |leftVal − rightVal| over the right rows that
  * share its group key, plus that group's right-row count.
  *
  * The same semantics have two physical regimes with OPPOSITE scaling, and
  * the r15 sweep measured both (SCALING_r15.json):
  *
  *  - '''pairwise''' — equi-join on the key, then min per left row. Cost
  *    Σ_k L_k·R_k: LINEAR when group SIZE is bounded and the group count
  *    scales (the reference's shape: ~11 defenders per frame), with
  *    unbounded parallelism and [[Joins.routed]]'s broadcast/salt/bloom
  *    moves underneath. Quadratic (measured cpu exponent 2.2 at 100×) when
  *    the group COUNT is fixed and both sides scale.
  *  - '''sorted-neighbor''' — union both sides per key, ONE exchange + sort
  *    by value; each left row's nearest right value is one of its two
  *    sorted neighbors, recovered by two growing-frame window passes.
  *    O((L+R) log) regardless of group size (47× less cpu than pairwise at
  *    100× on the fixed-group-count fixture), but parallelism is bounded by
  *    the group count — wrong for millions of tiny groups, where the
  *    pairwise join is linear anyway and saturates every core.
  *
  * Neither form is "the" operator; the REGIME is data-dependent, so this
  * entry point routes on the measured stats [[Joins]]' preflight already
  * collects (one cheap agg pass per side, cached): the Misra–Gries
  * `maxKeyRowsRight` is an UPPER bound on any single key's right-side rows,
  * so `maxKeyRowsRight ≤ maxPairwiseGroupRows` PROVES every per-left-row
  * fan-out is bounded and picks pairwise; anything above routes to
  * sorted-neighbor (the bound's one-sided error only ever demotes a
  * bounded-group input to the always-safe O(n log n) form, never the
  * reverse). The decision and its inputs are returned and logged, like
  * [[Joins.routed]].
  *
  * Both routes return EXACTLY the same bits: IEEE subtraction is
  * sign-symmetric (`b − a == −(a − b)` exactly), so the sorted form's
  * `v − below` / `above − v` equal the pairwise `abs(lv − rv)` at the
  * achieving neighbor, and the min over a group is achieved AT a sorted
  * neighbor. The spec pins bit-equality on both fixture shapes.
  *
  * Contract: output = every left row whose key matches ≥ 1 right row with a
  * non-null value (inner semantics), with ALL left columns preserved plus
  * `n_group` (bigint — matching right rows) and `min_gap` (double — null iff
  * the left value is null). Right rows with a null value or null key are
  * excluded from both the count and the gap; left column names must not
  * collide with those two. Keys pair up positionally like [[Joins.routed]].
  */
object NearestInGroup {

  final case class Decision(strategy: String, reason: String,
      maxKeyRowsRight: Long, rowsLeft: Long, rowsRight: Long)

  final case class Result(df: DataFrame, decision: Decision)

  /** Routed entry point — see the object scaladoc for the regime analysis.
    * `maxPairwiseGroupRows`: the proven per-key right-side bound above which
    * pairwise enumeration is declined. Default 256: pairwise materializes
    * `fan-out` candidate rows per left row while the sorted form pays
    * ~log(L+R) comparisons per row on an already-needed exchange, so the
    * break-even fan-out is low — well under the reference regime's ~11 and
    * well over anything "dimension-per-key"-shaped.
    */
  def nearest(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftVal: String, rightVal: String,
      maxPairwiseGroupRows: Long = 256L): Result = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"nearest: key lists must pair up, got $leftKeys / $rightKeys")
    require(!left.columns.contains("n_group") && !left.columns.contains("min_gap"),
      "nearest: left columns n_group/min_gap collide with the output contract")
    // measured routing stats: same cached one-pass-per-side preflight the
    // join router uses (Misra–Gries max-key bound rides the theta pass)
    val rv = right.filter(col(rightVal).isNotNull)
    val pf = Joins.cachedPreflight(left, rv, leftKeys, rightKeys,
      ThetaSketch.DefaultK).estimate
    val (strategy, reason) =
      if (pf.maxKeyRowsRight <= maxPairwiseGroupRows)
        ("pairwise",
          s"max right rows/key <= ${pf.maxKeyRowsRight} (MG upper bound) " +
          s"<= $maxPairwiseGroupRows: bounded fan-out, linear pairwise join " +
          "with unbounded parallelism")
      else
        ("sorted-neighbor",
          s"max right rows/key may reach ${pf.maxKeyRowsRight} (MG upper " +
          s"bound) > $maxPairwiseGroupRows: pairwise enumeration risks " +
          "quadratic blowup; one-exchange sorted-neighbor window is " +
          "O((L+R) log) at any group size")
    org.slf4j.LoggerFactory.getLogger("graft.operators.NearestInGroup").info(
      s"nearest-in-group [$strategy]: $reason; " +
        s"L ${pf.rowsLeft} x R ${pf.rowsRight}")
    val d = Decision(strategy, reason, pf.maxKeyRowsRight,
      pf.rowsLeft, pf.rowsRight)
    val df =
      if (strategy == "pairwise")
        pairwise(left, rv, leftKeys, rightKeys, leftVal, rightVal)
      else sortedNeighbor(left, rv, leftKeys, rightKeys, leftVal, rightVal)
    Result(df, d)
  }

  /** The join+min form. `right` must already be filtered to non-null
    * values. Routes the underlying equi-join through [[Joins.routed]].
    * Values compare as doubles (same cast the sorted form makes — the two
    * routes must return identical bits). */
  private[operators] def pairwise(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftVal: String, rightVal: String): DataFrame = {
    // a synthetic unique id keys "one output row per left ROW" without
    // assuming the caller's columns form a key (duplicate left rows stay
    // distinct); per-partition monotonic ids never collide
    val lid = left.withColumn("__nid", monotonically_increasing_id())
    // rename every right column so nothing collides with a left name
    val renamedKeys = rightKeys.indices.map(i => s"__nrk$i")
    val rBase = rightKeys.zip(renamedKeys).foldLeft(
      right.select((rightKeys :+ rightVal).distinct.map(col): _*)) {
        case (df, (k, n)) => df.withColumnRenamed(k, n)
      }
    val (rr, rvName) =
      if (rightKeys.contains(rightVal))
        (rBase, s"__nrk${rightKeys.indexOf(rightVal)}")
      else (rBase.withColumnRenamed(rightVal, "__nrv"), "__nrv")
    val routed = Joins.routed(lid, rr, leftKeys, renamedKeys)
    val aggs = left.columns.map(c => first(col(c)).as(c)).toSeq :+
      count(lit(1)).as("n_group") :+
      min(abs(col(leftVal).cast("double") - col(rvName).cast("double")))
        .as("min_gap")
    routed.df
      .groupBy("__nid")
      .agg(aggs.head, aggs.tail: _*)
      .drop("__nid")
      .select(left.columns.map(col) :+ col("n_group") :+ col("min_gap"): _*)
  }

  /** The union+window form. `right` must already be filtered to non-null
    * values. BOTH window frames are GROWING (unboundedPreceding..current):
    * Spark evaluates growing frames incrementally at O(1)/row but recomputes
    * a shrinking `1..unboundedFollowing` frame from scratch per row —
    * measured at 2165 cpu_s at 100×, worse than the pairwise join it
    * replaces (r15 NOTES §3). The forward neighbor is therefore a growing
    * frame over the REVERSED sort. Right rows sort before left rows at
    * equal value in both orders, so a zero-gap match is caught either way. */
  private[operators] def sortedNeighbor(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftVal: String, rightVal: String): DataFrame = {
    val keyCols = leftKeys.zipWithIndex.map { case (_, i) => s"__nk$i" }
    // ALL left columns ride the union — there is no synthetic row id and no
    // rejoin. An earlier form tagged the left with
    // monotonically_increasing_id and re-attached the full row afterwards,
    // which evaluates the left subtree TWICE; over an order-unstable source
    // (sample, round-robin repartition) the two evaluations can assign
    // different ids and silently drop or misattach rows. Carrying the row
    // through is also cheaper: one full-width exchange replaces a narrow
    // exchange plus a two-sided join shuffle of the same full-width rows.
    val lTagged = leftKeys.zip(keyCols).foldLeft(left) {
        case (df, (k, kc)) => df.withColumn(kc, col(k))
      }
      .withColumn("__nv", col(leftVal).cast("double"))
      .withColumn("__nis_r", lit(0))
    val rTagged = rightKeys.zip(keyCols).foldLeft(
        right.select(rightKeys.map(col) :+ col(rightVal): _*)) {
        case (df, (k, kc)) => df.withColumnRenamed(k, kc)
      }
      .select(keyCols.map(col) :+
        col(rightVal).cast("double").as("__nv") :+
        lit(1).as("__nis_r"): _*)
    // null-keyed left rows can never match (inner contract) — drop before
    // the exchange so the classic one-reducer null hotspot never forms
    val lNonNull = lTagged.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
    val rNonNull = rTagged.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
    // right rows take typed nulls for the carried left columns
    val union = lNonNull.unionByName(rNonNull, allowMissingColumns = true)
    val rvWhenRight = when(col("__nis_r") === 1, col("__nv"))
    // no explicit tiebreak beyond (__nv, __nis_r): rows tied on value see
    // the same below/above regardless of their relative order (right rows
    // sort first among ties, and every tied right row contributes the same
    // __nv), so the window values are order-invariant — bit-equality with
    // pairwise holds under any tie permutation (spec-pinned)
    val below = last(rvWhenRight, ignoreNulls = true).over(
      Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("__nv").asc_nulls_last, col("__nis_r").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val above = last(rvWhenRight, ignoreNulls = true).over(
      Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("__nv").desc_nulls_last, col("__nis_r").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val counts = rNonNull.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_group"))
    union
      .withColumn("__nbelow", below)
      .withColumn("__nabove", above)
      .filter(col("__nis_r") === 0)
      .join(counts, keyCols) // inner: drops left rows with no right match
      .withColumn("min_gap", least(
        when(col("__nbelow").isNotNull, col("__nv") - col("__nbelow")),
        when(col("__nabove").isNotNull, col("__nabove") - col("__nv"))))
      .select(left.columns.map(col) :+ col("n_group") :+ col("min_gap"): _*)
  }
}
