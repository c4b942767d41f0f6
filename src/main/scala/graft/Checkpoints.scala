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
    * release strictly after the last action that consumes the lineage. */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
