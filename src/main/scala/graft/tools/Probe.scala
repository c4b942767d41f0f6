package graft.tools

import graft.GraftSession
import graft.sources.Tables

/** Dev-only: print schemas + sample rows for every testdata table. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    Tables.names.foreach { t =>
      try {
        val df = Tables.read(spark, dir, t)
        println(s"== $t: ${df.schema.simpleString}")
        df.show(2, truncate = 60)
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
