package graft.tools

import graft.GraftSession

/** Dev tool: execute one registry query and print its FINAL (post-AQE)
  * physical plan — the thing to audit for broadcast vs shuffle, pushdown,
  * and codegen spans before calling an operator done.
  *
  *   sbt "runMain graft.tools.PlanPeek <sfDir> <query>"
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(plan.toString.linesIterator.map(_.take(110)).mkString("\n"))
  }
}
