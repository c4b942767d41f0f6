package graft.tools

import graft.GraftSession

/** Dev probe: time pieces of a plan over an arbitrary parquet path, to
  * bisect WHERE a scale exponent comes from without touching the registry.
  * Modes (each timed `runs` times after one warm, min executor-cpu
  * reported): `scan` (full-column noop write), `sort <col>` (global orderBy
  * then noop), `agg <col>` (sum of a column — scan without row
  * materialization).
  *
  *   scripts/run_tool.sh graft.tools.PathProbe <parquetPath> <mode> [col] [runs]
  */
object PathProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PathProbe <path> scan|sort|agg [col] [runs]")
    val (path, mode) = (args(0), args(1))
    val colName = if (args.length > 2) args(2) else ""
    val runs = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString).toInt
    val spark = GraftSession.builder(cpus,
      new java.io.File(path).getParent).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          cpu.addAndGet(st.stageInfo.taskMetrics.executorCpuTime); ()
        }
      })
    def settled(): Long = {
      var prev = cpu.get; var i = 0
      while (i < 20) {
        Thread.sleep(50)
        val c = cpu.get
        if (c == prev) i = 20 else { prev = c; i += 1 }
      }
      prev
    }
    def body(): Unit = {
      val df = spark.read.parquet(path)
      val out = mode match {
        case "scan" => df
        case "sort" => df.orderBy(colName)
        case "agg"  => df.groupBy().sum(colName)
      }
      out.write.mode("overwrite").format("noop").save()
    }
    body() // warm
    val cpus2 = (1 to runs).map { _ =>
      val c0 = settled(); val t0 = System.nanoTime()
      body()
      val wall = (System.nanoTime() - t0) / 1e9
      (settled() - c0) / 1e9 -> wall
    }
    val best = cpus2.minBy(_._1)
    println(f"[pathprobe] $path $mode $colName: min cpu ${best._1}%.3f s " +
      f"(wall ${best._2}%.3f) over $runs runs; all ${cpus2.map(_._1).map(c => f"$c%.2f").mkString(",")}")
    spark.stop()
  }
}
