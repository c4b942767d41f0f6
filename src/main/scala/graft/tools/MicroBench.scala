package graft.tools

import graft.GraftSession
import graft.queries.Registry

/** Dev-only: time named registry queries (median of 3 runs after warmup). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      Registry.all.find(_.name == name).foreach { q =>
        q.run(spark, dir).count() // warmup
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          q.run(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"${q.name}%-28s median ${times(1)}%.3f s  (${times.mkString(", ")})")
      }
    }
    spark.stop()
  }
}
