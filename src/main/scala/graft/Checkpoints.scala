package graft

import org.apache.spark.sql.DataFrame

/** localCheckpoint lifecycle: `Dataset.unpersist` does NOT free the RDD
  * behind a localCheckpoint (the storage blocks belong to the materialized
  * RDD inside the `LogicalRDD` relation, not to the Dataset), and waiting
  * for the ContextCleaner ties block lifetime to driver GC timing —
  * unbounded accumulation on a long-lived driver (a streaming query
  * checkpointing per micro-batch, an iterative operator checkpointing per
  * round). Every operator that checkpoints intermediates releases them
  * through here; specs assert the surviving-block budget.
  */
object Checkpoints {

  /** Unpersist the RDD behind a localCheckpoint'd frame; no-op for frames
    * that are not checkpoint reads. Safe while downstream frames built from
    * `df` are still lazy ONLY if they are never executed afterwards —
    * release strictly after the last action that consumes the lineage.
    *
    * Matches on the ANALYZED plan with alias wrappers stripped: a
    * checkpointed frame that crossed a session boundary through a global
    * temp view (PageRank / Bpe's isolated iteration sessions) analyzes to
    * `SubqueryAlias(view, LogicalRDD)` — the raw-logical match alone would
    * silently leak those blocks. */
  def release(df: DataFrame): Unit = {
    @annotation.tailrec
    def strip(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        strip(a.child)
      case v: org.apache.spark.sql.catalyst.plans.logical.View =>
        strip(v.child)
      case other => other
    }
    strip(df.queryExecution.analyzed) match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
  }
}
