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
    if (args.length != 2) {
      System.err.println("usage: graft.tools.PlanPeek <sfDir> <query>")
      sys.exit(2)
    }
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(graft.SparkEntry.queries.contains(args(1)),
      s"unknown query ${args(1)} — see SparkEntry.queries")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    // execute THIS queryExecution (count() would build and run a different
    // one over groupBy().count(), leaving df's AQE plan un-finalized — the
    // printout would be the INITIAL plan while claiming to be final)
    df.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(plan.toString.linesIterator.map(_.take(110)).mkString("\n"))
    spark.stop()
  }
}
