package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the canonical iterative
  * graph centrality, run as K rounds of join + aggregate (the shape GraphX
  * and every warehouse implementation use; no custom partitioner needed
  * because each round is one shuffle on dst).
  *
  * r_{k+1}(v) = (1−d)/N + d · ( Σ_{u→v} r_k(u)/outdeg(u) + dangling_k/N )
  *
  * with dangling mass (rank held by nodes without out-edges) redistributed
  * uniformly. Multi-edges contribute once per edge (multigraph semantics);
  * self-loops are ordinary edges.
  *
  * Determinism — FIXED-POINT pico-units: ranks are exact BIGINTs (1e12 =
  * total mass), so the order-dependent floating sums of a naive PageRank
  * become exact integer additions, and the only inexact steps are double
  * DIVISIONS of identical inputs (correctly rounded, so bit-identical on
  * any engine) followed by round-to-integer — the one rounding primitive
  * DuckDB and the JVM agree on for every double (no pre-multiply, unlike
  * round-to-k-decimals; the sf1 t_unigram_lm finding). At a fixed K the
  * result is bit-stable across partitionings and engines — the
  * `e_pagerank_types` oracle mirrors the iteration as unrolled DuckDB CTEs
  * and hash-matches with NO rounding tolerance. Per-round drift from the
  * integer rounding is ≤ N/2 + 1 pico (Σ ranks stays 1 ± 1e-6 for any
  * realistic N; spec-asserted).
  *
  * Scale: per round, one shuffle keyed on dst for the in-sum and a tiny
  * broadcast of the dangling scalar; ranks are localCheckpoint'ed every few
  * rounds so the plan does not deepen with K.
  */
object PageRank {

  val Unit: Long = 1_000_000_000_000L // pico-units of rank mass

  /** @param edges (src, dst) rows; column names configurable
    * @return (node, rank) for every node appearing as src or dst, rank in
    *         [0, 1] doubles summing to ~1 */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0.0))
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nD = n.toDouble
    val oneMinusD = 1.0 - damping

    // r0 = round(Unit / N) pico each
    var ranks = nodes.withColumn("r_mc",
      round(lit(Unit.toDouble) / nD).cast("long"))
    val intermediates = scala.collection.mutable.Buffer.empty[DataFrame]
    for (i <- 1 to iterations) {
      val withDeg = ranks.join(deg, Seq("node"), "left")
      // dangling mass: exact BIGINT sum over nodes with no out-edges
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("r_mc")), lit(0L)).as("dang_mc"))
      // per-edge contribution: bigint/bigint is true (double) division in
      // both engines; round-to-integer of the identical double is exact
      val contribs = withDeg.filter(col("deg").isNotNull)
        .join(e, withDeg("node") === e("src"))
        .select(col("dst").as("node"),
          round(col("r_mc") / col("deg")).cast("long").as("c_mc"))
      val inSums = contribs.groupBy("node").agg(sum(col("c_mc")).as("in_mc"))
      // explicit broadcast of the 1-row dangling frame: AQE would usually
      // pick it anyway, but plan stability at scale should not depend on a
      // runtime re-plan (same discipline as AsofJoin's span frame)
      val next = nodes.join(inSums, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          round(lit(oneMinusD) * Unit / nD + lit(damping) *
            (coalesce(col("in_mc"), lit(0L)) + col("dang_mc") / nD))
            .cast("long").as("r_mc"))
      // checkpoint every few rounds: K joins would otherwise stack into one
      // unboundedly deep plan (analysis cost + no stage reuse)
      ranks = if (i % 5 == 0 || i == iterations) {
        val cp = next.localCheckpoint(true)
        intermediates += cp
        cp
      } else next
    }
    // Materialize the result as its own checkpoint, then RELEASE every
    // intermediate cache (nodes, deg, per-5-round ranks — the cache-leak
    // class the round-5 ADVICE flagged on IVF-PQ). What remains cached is
    // exactly one O(|V|) block backing the returned frame.
    val result = ranks.select(col("node"),
      (col("r_mc").cast("double") / Unit.toDouble).as("rank"))
      .localCheckpoint(true)
    (intermediates.toSeq :+ nodes :+ deg).foreach(releaseCheckpoint)
    result
  }

  private def releaseCheckpoint(df: DataFrame): Unit = graft.Checkpoints.release(df)
}
