package graft.tools

import graft.GraftSession
import graft.queries.Registry

/** Dev-only: print the formatted physical plan for the named queries (or the
  * headline set) — used to audit broadcast/pushdown/codegen per SURVEY §4.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val targets = if (args.nonEmpty) args.toSeq else Registry.headline.map(_.name)
    targets.foreach { name =>
      Registry.all.find(_.name == name).foreach { q =>
        println(s"\n========== ${q.name} ==========")
        q.run(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }
}
