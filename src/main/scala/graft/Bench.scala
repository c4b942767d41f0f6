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
    // Median of 3 timed runs per query: single-shot numbers on a shared box
    // swing 2× with background load; the median is the steady-state figure.
    val results = Registry.headline.map { q =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e"); -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      q.name -> times(1)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","stat":"median_of_3",""" +
      s""""queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
