package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Post-AQE physical-plan fingerprint: the shuffle/broadcast shape of a
  * query, reduced to four counts. `PlanFingerprintSpec` pins one per
  * headline query so a code or Catalyst change that silently de-broadcasts
  * a join or adds an exchange fails CI instead of shipping a 100×-slower
  * plan; `tools.PlanFingerprint` regenerates the table after an
  * INTENTIONAL change.
  */
object PlanFingerprints {

  final case class Fp(exchanges: Int, broadcastJoins: Int, sortMergeJoins: Int,
      nestedLoops: Int) {
    /** Compact run-stamp form for bench artifacts: `e4b3s0n0`. */
    def brief: String = s"e${exchanges}b${broadcastJoins}s$sortMergeJoins" +
      s"n$nestedLoops"
  }

  /** Execute `df` (finalizing AQE via its OWN queryExecution — the PlanPeek
    * discipline) and count the plan's shape nodes, descending through query
    * stages so AQE's reuse wrappers don't hide exchanges. */
  def of(df: DataFrame): Fp = {
    df.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    ofExecuted(df)
  }

  /** Fingerprint a frame that the caller ALREADY executed (its AQE plan is
    * final) without re-running it — what [[graft.Bench]] uses to stamp each
    * timed sf1 run with the plan it actually got, so a one-in-three AQE
    * replan (the r12 cpu-blowup suspect) is attributable run-by-run. */
  def ofExecuted(df: DataFrame): Fp = {
    def descend(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      case q: QueryStageExec => descend(q.plan)
      case other =>
        other.children.flatMap(descend) ++
          other.subqueries.flatMap(descend)
    })
    val nodes = descend(df.queryExecution.executedPlan)
    Fp(
      nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
      nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      nodes.count {
        case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
        case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
        case _ => false
      })
  }
}
