package graft.tools

import graft.GraftSession
import graft.operators.Joins

/** Print the routed-join decision for a (table, table, keys) template at a
  * given data dir — the scale-rehearsal check that router decisions FLIP
  * when the data size says they should (r14 VERDICT #1), e.g. the
  * SHUFFLE_HASH election declining its non-spillable build once the
  * per-partition footprint outgrows the slot budget.
  *
  * Usage: runMain graft.tools.RouteProbe <sfDir> <leftTable> <rightTable>
  *        <leftKey[,k2…]> <rightKey[,k2…]> [broadcastMaxRows]
  */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: RouteProbe <sfDir> <left> <right> <lKeys> <rKeys> [broadcastMaxRows]")
    val Array(dir, lt, rt, lk, rk) = args.take(5)
    val bmr = if (args.length > 5) args(5).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def table(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val rj = Joins.routed(table(lt), table(rt),
      lk.split(",").toSeq, rk.split(",").toSeq,
      Joins.RouteConfig(broadcastMaxRows = bmr))
    println(s"[route] $dir $lt*$rt [$lk=$rk bmr=$bmr] -> " +
      s"${rj.decision.strategy}: ${rj.decision.reason}")
    spark.stop()
  }
}
