package graft

import graft.queries.Registry

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and prints one
  * JSON line {"metric":…,"value":…,"queries":{…},"sf":…}. Each query is forced with
  * a count() (full execution, no result materialization on the driver).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString).toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm each headline query once on the smallest SF so timings measure
    // steady-state execution, not first-call classloading + codegen.
    Registry.headline.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val results = Registry.headline.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e"); -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
