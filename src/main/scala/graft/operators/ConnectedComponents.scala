package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step of a near-dup
  * pipeline: LSH/SimHash emit candidate PAIRS, but "keep one doc per
  * duplicate group" needs the transitive closure of those pairs (doc A≈B,
  * B≈C ⇒ {A,B,C} is one group even if A,C never collided in a band).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round, every node takes the min of its own label
  * and its neighbors' labels; converged when no label changes. Each round
  * is one shuffle join (labels ⋈ edges on the neighbor id) + one hash agg —
  * both on the node-id key, so AQE coalesces/splits partitions freely.
  * Rounds needed = graph diameter, and near-dup graphs are unions of small
  * dense clusters (stars/cliques from band collisions), so 2-4 rounds in
  * practice. For adversarial long-path graphs switch to alternating
  * large-star/small-star contraction (Kiveris et al., "Connected Components
  * in MapReduce and Beyond"), which converges in O(log² n) rounds — not
  * needed for the dedup workload this serves.
  *
  * Scale notes: `localCheckpoint` truncates lineage each round (otherwise
  * the plan doubles per iteration and planning time dominates); the edge
  * list is symmetrized once and reused; labels are (long, long) pairs —
  * ~16 bytes/node — so even 10^11 nodes spill gracefully under the usual
  * shuffle configuration.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `edges` (columns `src`,
    * `dst`). Returns one row per node appearing in any edge: (id, component)
    * where component = min node id reachable.
    */
  def run(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 50): DataFrame = {
    val sym = edges
      .select(col(src).cast("long").as("id"), col(dst).cast("long").as("nb"))
      .union(edges.select(col(dst).cast("long").as("id"), col(src).cast("long").as("nb")))
      .filter(col("id") =!= col("nb"))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select("id").distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)

    // Convergence test: labels only ever DECREASE, so the label sum is
    // strictly monotone and "sum unchanged ⇔ no label changed" — one tiny
    // aggregate over the checkpointed labels instead of a join + count per
    // round. decimal(38,0) so the sum can't overflow at 10^11 × 10^11-sized
    // ids.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)

    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "nb"), Seq("nb"))
        .select("id", "comp")
      labels = labels.union(viaNeighbor)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      it += 1
    }
    require(converged, s"did not converge in $maxIter rounds (diameter too " +
      "large for label propagation — use star-contraction instead)")
    labels
  }
}
