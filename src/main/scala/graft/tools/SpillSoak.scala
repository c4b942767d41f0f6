package graft.tools

import graft.{Bench, GraftSession}
import graft.queries.Registry

/** Memory-pressure soak of the sf1 heavy tail (r13 VERDICT #6): the 128 GiB
  * dev box never spills at sf1, so the spill-path behavior of the heavy
  * plans is otherwise untested. Run this main under a deliberately
  * constrained session — heap and/or `spark.memory.fraction` via JVM flags,
  * e.g.
  *
  *   SPARK_DRIVER_MEM=4g SPARK_MEMORY_FRACTION=0.15 \
  *     sbt "runMain graft.tools.SpillSoak /tmp/graft_sf1 /tmp/soak_constrained.json"
  *
  * and once unconstrained, then diff the two JSONs. Per query it records
  * wall seconds, executor CPU seconds, shuffle-write bytes, and the two
  * spill counters (in-memory bytes spilled and bytes hitting disk) from a
  * stage-completion listener. One untimed sf0.001 warm pass covers
  * classloading/codegen so the sf1 numbers measure execution, not startup.
  *
  * Output: one JSON object per line per query on stdout AND a combined
  * JSON file — the NOTES table is generated from the file.
  */
object SpillSoak {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val outPath = if (args.length > 1) args(1) else "/tmp/spill_soak.json"
    // warm corpus: smallest SF by default, overridable (r14 advisory: the
    // warm pass must not silently pin a path unrelated to the soak target)
    val warmDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString).toInt
    // memory.fraction must land before the first SparkContext of the JVM
    // (the MemoryManager reads it once); env beats -D because the forked
    // run JVM only sees build.sbt's fixed javaOptions
    val spark = GraftSession.builder(cpus, sfDir)
      .config("spark.memory.fraction",
        sys.env.getOrElse("SPARK_MEMORY_FRACTION", "0.6"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuNanos = new java.util.concurrent.atomic.AtomicLong
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = st.stageInfo.taskMetrics
          cpuNanos.addAndGet(m.executorCpuTime)
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          ()
        }
      })
    def stable(): (Double, Long, Long, Long) = {
      var prev = (cpuNanos.get, shuffleBytes.get, memSpill.get, diskSpill.get)
      var i = 0
      while (i < 20) {
        Thread.sleep(50)
        val cur = (cpuNanos.get, shuffleBytes.get, memSpill.get, diskSpill.get)
        if (cur == prev) i = 20 else { prev = cur; i += 1 }
      }
      (prev._1 / 1e9, prev._2, prev._3, prev._4)
    }

    val mem = Runtime.getRuntime.maxMemory() / (1 << 20)
    val frac = spark.conf.getOption("spark.memory.fraction").getOrElse("0.6")
    System.err.println(s"[soak] heap ${mem}MB, memory.fraction $frac, " +
      s"cpus $cpus, sf dir $sfDir")

    // out-of-window staging, same rationale as Bench's sf1 section
    try graft.queries.JoinQueries.bucketedFacts(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[soak] staging: $e") }

    val byName = Registry.headline.map(q => q.name -> q).toMap
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Bench.Sf1Heavy.foreach { name =>
      byName.get(name).foreach { q =>
        try q.run(spark, warmDir).count() // warm: JIT/codegen
        catch { case _: Throwable => () }
        stable()
        val (c0, s0, m0, d0) = (cpuNanos.get / 1e9, shuffleBytes.get,
          memSpill.get, diskSpill.get)
        val t0 = System.nanoTime()
        val rec =
          try {
            q.run(spark, sfDir).groupBy().count().collect()
            val wall = (System.nanoTime() - t0) / 1e9
            val (c1, s1, m1, d1) = stable()
            f"""{"wall":$wall%.3f,"cpu_s":${c1 - c0}%.3f,""" +
              s""""shuffle_mb":${(s1 - s0) / (1 << 20)},""" +
              s""""mem_spill_mb":${(m1 - m0) / (1 << 20)},""" +
              s""""disk_spill_mb":${(d1 - d0) / (1 << 20)}}"""
          } catch {
            case e: Throwable =>
              // full JSON string escaping (r14 advisory: backslashes in
              // Hadoop paths / regex text made the artifact unparseable)
              s"""{"error":${graft.JsonText.quote(
                s"${e.getClass.getSimpleName}: ${
                  String.valueOf(e.getMessage).take(160)}")}}"""
          }
        rows(name) = rec
        System.err.println(s"[soak] $name -> $rec")
      }
    }
    val body = rows.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val doc = s"""{"heap_mb":$mem,"memory_fraction":"$frac","sf":"$sfDir","queries":{$body}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), doc)
    println(doc)
    spark.stop()
  }
}
